"""On-device image ops: grayscale, triptych split, resize, dtype ladders.

The reference does all of this on host with cv2/PIL
(reference: src/preprocess.py:21-45, src/optimized_dataset.py:56-79).
Here they are jit-safe XLA ops so the serving/eval pipelines keep data in
HBM; host decode (PNG bytes -> uint8 array) stays in the data layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


#: ITU-R BT.601 luminance weights used by the reference
#: (reference: src/preprocess.py:32-36) and by cv2's RGB2GRAY.
LUMA_WEIGHTS = (0.299, 0.587, 0.114)


def rgb_to_gray_luminance(img: jax.Array) -> jax.Array:
    """Luminance grayscale of (..., H, W, C>=3); keeps a trailing 1-channel.

    Uses 0.299 R + 0.587 G + 0.114 B; alpha (if any) is ignored, matching
    the reference's RGBA handling (reference: src/preprocess.py:30-33).
    """
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    w = LUMA_WEIGHTS
    return (w[0] * r + w[1] * g + w[2] * b)[..., None]


def split_triptych(img: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Split a horizontal [ground-truth | glared | mask] triptych.

    Input (..., H, 3*W, C) -> three (..., H, W, C) arrays
    (reference: src/preprocess.py:21-27, scripts/split_image.py:40-44).
    """
    width = img.shape[-2]
    third = width // 3
    gt = img[..., :, :third, :]
    glared = img[..., :, third : 2 * third, :]
    mask = img[..., :, 2 * third : 3 * third, :]
    return gt, glared, mask


def resize_bilinear(img: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinear resize of (..., H, W, C) to (..., height, width, C).

    jax.image half-pixel-centers bilinear with antialias OFF — the same
    2x2-neighborhood convention as cv2.resize(INTER_LINEAR) used in the
    reference data path (reference: src/optimized_dataset.py:74-75).
    jax.image.resize defaults to antialias=True, which widens the kernel
    on downscale and diverges from cv2 well beyond rounding.
    """
    out_shape = img.shape[:-3] + (height, width, img.shape[-1])
    return jax.image.resize(img, out_shape, method="bilinear",
                            antialias=False)


def from_uint8(img: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 [0,255] -> float [0,1] (reference: src/preprocess.py:44-45)."""
    return img.astype(dtype) / jnp.asarray(255.0, dtype)


def to_uint8(img: jax.Array) -> jax.Array:
    """float [0,1] -> uint8, clipping first (reference: src/preprocess.py:107-110)."""
    y = jnp.clip(img.astype(jnp.float32), 0.0, 1.0) * 255.0
    return y.astype(jnp.uint8)


def pad_to_multiple(img: jax.Array, multiple: int, *, mode: str = "edge"):
    """Pad H and W of (..., H, W, C) up to the next multiple.

    Returns (padded, (orig_h, orig_w)). Used by the tiler so arbitrary
    resolutions map onto a static tile grid (XLA needs static shapes).
    """
    h, w = img.shape[-3], img.shape[-2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph == 0 and pw == 0:
        return img, (h, w)
    pad_width = [(0, 0)] * (img.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return jnp.pad(img, pad_width, mode=mode), (h, w)
