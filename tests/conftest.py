"""Test config: force CPU backend with 8 virtual devices.

This is the standard JAX trick for exercising multi-device sharding
(pjit / shard_map over a Mesh) without TPU hardware; numerics tests also
run faster and deterministically on CPU.

Note: this environment's sitecustomize force-registers a remote TPU PJRT
plugin and pins JAX_PLATFORMS=axon, so the env var alone is not enough —
we must override via jax.config before any backend is initialized.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compilation cache: whole-model CPU compiles dominate suite
# time; repeat runs hit the cache and finish several times faster.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


def pytest_collection_modifyitems(items):
    # every test driving the 2-process multi-host fixture costs a real
    # double-subprocess JAX boot + distributed run; auto-mark them slow so
    # `-m "not slow"` gives a fast inner loop without per-test decorators
    for item in items:
        if "two_host_run" in getattr(item, "fixturenames", ()):
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
