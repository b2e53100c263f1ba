"""Image-quality metrics as jitted device functions.

The reference computes PSNR/SSIM on host with scikit-image
(reference: evaluate.py:267,271; optimized_train.py:114,118 — both with
``data_range=1.0``). Here they are pure JAX so the whole eval loop stays on
the TPU; values match skimage's defaults:

- PSNR: 10*log10(data_range^2 / mse)
- SSIM: 7x7 uniform window, K1=0.01, K2=0.03, sample (unbiased) covariance,
  and skimage's crop-by-window-radius before averaging. Because the window
  radius equals the crop, every retained window is fully interior, so a
  VALID sliding window reproduces skimage exactly (no edge padding needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean absolute error (torch.nn.L1Loss with mean reduction)."""
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def psnr(pred: jax.Array, target: jax.Array, *, data_range: float = 1.0) -> jax.Array:
    """Peak signal-to-noise ratio in dB over the full array."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    mse = jnp.mean(jnp.square(p - t))
    return 10.0 * jnp.log10((data_range * data_range) / mse)


def _uniform_filter_valid(x: jax.Array, win: int) -> jax.Array:
    """Mean over win x win windows, VALID, on (..., H, W).

    Separable two-pass form: win+win adds per output instead of win*win
    for the naive 2-D window."""
    y = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1,) * (x.ndim - 2) + (win, 1),
        window_strides=(1,) * x.ndim,
        padding="VALID",
    )
    y = lax.reduce_window(
        y,
        0.0,
        lax.add,
        window_dimensions=(1,) * (x.ndim - 2) + (1, win),
        window_strides=(1,) * x.ndim,
        padding="VALID",
    )
    return y * (1.0 / (win * win))


def ssim(
    pred: jax.Array,
    target: jax.Array,
    *,
    data_range: float = 1.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Structural similarity of a single 2-D image pair (H, W).

    Matches skimage.metrics.structural_similarity defaults for 2-D float
    input: uniform 7x7 window, sample covariance normalization
    NP/(NP-1), and cropping the window radius off the similarity map
    before averaging.
    """
    if pred.shape[-2] < win_size or pred.shape[-1] < win_size:
        # skimage raises for this too; without the check a (win_size-1)-
        # extent image yields an EMPTY valid window map whose mean is a
        # silent NaN that poisons averaged val/eval metrics
        raise ValueError(
            f"ssim win_size={win_size} exceeds image extent "
            f"{pred.shape[-2]}x{pred.shape[-1]}")
    x = pred.astype(jnp.float32)[None]
    y = target.astype(jnp.float32)[None]

    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)

    ux = _uniform_filter_valid(x, win_size)
    uy = _uniform_filter_valid(y, win_size)
    uxx = _uniform_filter_valid(x * x, win_size)
    uyy = _uniform_filter_valid(y * y, win_size)
    uxy = _uniform_filter_valid(x * y, win_size)

    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    return jnp.mean(s)


def batched_psnr_ssim(
    pred: jax.Array,
    target: jax.Array,
    *,
    data_range: float = 1.0,
    clip_pred: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Per-image PSNR and SSIM over a batch of single-channel images
    (NHW1, N1HW, or NHW).

    The reference clips predictions to [0, 1] before metrics but NOT before
    L1 (reference: evaluate.py:251 vs :264) — hence ``clip_pred`` here and
    not in :func:`l1_loss`.

    Returns:
        (psnr_per_image, ssim_per_image), each shape (N,).
    """
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    if p.ndim == 4:
        if p.shape[-1] == 1:      # NHW1
            p, t = p[..., 0], t[..., 0]
        elif p.shape[1] == 1:     # NCHW single-channel (torch-layout input)
            p, t = p[:, 0], t[:, 0]
        else:
            raise ValueError(
                f"batched_psnr_ssim expects single-channel images (NHW1, "
                f"N1HW, or NHW); got shape {tuple(pred.shape)}")
    if clip_pred:
        p = jnp.clip(p, 0.0, 1.0)
    psnrs = jax.vmap(lambda a, b: psnr(a, b, data_range=data_range))(p, t)
    ssims = jax.vmap(lambda a, b: ssim(a, b, data_range=data_range))(p, t)
    return psnrs, ssims
