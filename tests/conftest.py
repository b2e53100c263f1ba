"""Test config: force CPU backend with 8 virtual devices.

This is the standard JAX trick for exercising multi-device sharding
(pjit / shard_map over a Mesh) without TPU hardware; numerics tests also
run faster and deterministically on CPU.

Note: this environment's sitecustomize force-registers a remote TPU PJRT
plugin and pins JAX_PLATFORMS=axon, so the env var alone is not enough —
we must override via jax.config before any backend is initialized.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
