"""Reproducibility: one seed for everything.

The reference pins PYTHONHASHSEED, random, numpy, torch and cuDNN
determinism (reference: src/utils.py:6-52). In JAX, determinism is the
default — computations are pure functions of explicit PRNG keys — so this
reduces to seeding the host-side RNGs (used by data shuffling/augmentation)
and handing out a root jax PRNG key.
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int = 42, *, verbose: bool = True):
    """Seed host RNGs and return the root ``jax.random.PRNGKey``.

    Returns:
        A jax PRNG key derived from ``seed``. Thread it through model init,
        augmentation, and any stochastic device code.
    """
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)

    import jax

    key = jax.random.PRNGKey(seed)
    if verbose:
        print(f"All random seeds set to {seed} for reproducibility")
    return key
