"""Device-side training augmentations (batched, jitted, mesh-shardable).

TPU-native counterpart of the host pipeline in ``data.augment`` — the
reference augments per sample on DataLoader worker CPUs (reference:
src/optimized_dataset.py:147-174); here the whole batch augments on
device inside the training step, so the host input path only decodes and
ships raw pixels. On a host-bound input pipeline (one CPU feeding a fast
chip) this removes the augmentation from the critical path entirely.

``device_augment_batch`` reproduces the DISTRIBUTIONS of
``data.augment.optimized_augment`` exactly — per-sample
HorizontalFlip(p=.5) applied to image+target, then OneOf(p=.5) of
brightness/contrast (w=.8, limit 0.2) or gaussian noise (w=.2,
var ~ U[10,50] on the 0-255 scale) applied to the image only — but from
the jitted jax.random stream (keyed off the TrainState rng), not the
per-index numpy stream, so individual samples differ from the host path
while the statistics match. Everything is elementwise per sample, so a
batch sharded over a mesh augments data-parallel with no collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def device_augment_batch(key: jax.Array, images: jax.Array,
                         targets: jax.Array):
    """Augment one NHWC batch on device.

    Args:
        key: PRNG key (fold in the step counter for a fresh draw per step).
        images, targets: (B, H, W, C) float arrays in [0, 1].
    Returns (images, targets) with per-sample augmentations applied.
    """
    b = images.shape[0]
    k_flip, k_do, k_pick, k_alpha, k_beta, k_var, k_noise = \
        jax.random.split(key, 7)
    compute = images.dtype

    # HorizontalFlip(p=0.5) — geometric, so image AND target flip together
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))[:, None, None, None]
    images = jnp.where(flip, images[:, :, ::-1, :], images)
    targets = jnp.where(flip, targets[:, :, ::-1, :], targets)

    # OneOf(p=0.5){brightness/contrast w=.8 | gauss noise w=.2}, image only
    do_pixel = jax.random.bernoulli(k_do, 0.5, (b,))[:, None, None, None]
    pick_bc = jax.random.bernoulli(k_pick, 0.8, (b,))[:, None, None, None]

    alpha = (1.0 + jax.random.uniform(k_alpha, (b,), jnp.float32,
                                      -0.2, 0.2))[:, None, None, None]
    beta = jax.random.uniform(k_beta, (b,), jnp.float32,
                              -0.2, 0.2)[:, None, None, None]
    bc = jnp.clip(images.astype(jnp.float32) * alpha + beta, 0.0, 1.0)

    var = (jax.random.uniform(k_var, (b,), jnp.float32, 10.0, 50.0)
           / (255.0 ** 2))[:, None, None, None]
    noise = jax.random.normal(k_noise, images.shape, jnp.float32) * \
        jnp.sqrt(var)
    gn = jnp.clip(images.astype(jnp.float32) + noise, 0.0, 1.0)

    aug = jnp.where(pick_bc, bc, gn).astype(compute)
    images = jnp.where(do_pixel, aug, images)
    return images, targets
