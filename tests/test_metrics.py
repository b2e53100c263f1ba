"""PSNR/SSIM parity against independent host implementations.

skimage is not in the environment; the SSIM oracle here is a direct
sliding-window numpy implementation of the published formula with
skimage's 2-D float defaults (uniform 7x7 window, sample covariance,
crop-by-radius), which our jitted version must match.
"""

import numpy as np
import jax
import jax.numpy as jnp

from image_enhancement_deglaring_tpu.ops import batched_psnr_ssim, l1_loss, psnr, ssim

_jit_psnr = jax.jit(psnr)
_jit_ssim = jax.jit(ssim)
_jit_batched = jax.jit(batched_psnr_ssim)
_jit_l1 = jax.jit(l1_loss)


def _psnr_np(a, b, data_range=1.0):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(data_range**2 / mse)


def _ssim_np(im1, im2, data_range=1.0, win=7, k1=0.01, k2=0.03):
    from numpy.lib.stride_tricks import sliding_window_view

    w1 = sliding_window_view(im1, (win, win)).reshape(-1, win * win)
    w2 = sliding_window_view(im2, (win, win)).reshape(-1, win * win)
    np_ = win * win
    cov_norm = np_ / (np_ - 1)
    ux = w1.mean(-1)
    uy = w2.mean(-1)
    vx = cov_norm * (np.mean(w1 * w1, -1) - ux * ux)
    vy = cov_norm * (np.mean(w2 * w2, -1) - uy * uy)
    vxy = cov_norm * (np.mean(w1 * w2, -1) - ux * uy)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    return s.mean()


def test_psnr_matches_numpy(rng):
    a = rng.random((64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    got = float(_jit_psnr(jnp.asarray(b), jnp.asarray(a)))
    want = _psnr_np(b.astype(np.float64), a.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ssim_matches_reference_formula(rng):
    a = rng.random((64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    got = float(_jit_ssim(jnp.asarray(b), jnp.asarray(a)))
    want = _ssim_np(b.astype(np.float64), a.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ssim_identical_images_is_one(rng):
    a = rng.random((32, 32)).astype(np.float32)
    assert float(_jit_ssim(jnp.asarray(a), jnp.asarray(a))) == 1.0


def test_batched_metrics_clip_semantics(rng):
    # Predictions outside [0,1] must be clipped before PSNR/SSIM
    # (reference: evaluate.py:264) but L1 must use the raw values
    # (reference: evaluate.py:251).
    target = rng.random((2, 32, 32, 1)).astype(np.float32)
    pred = target + 0.5  # all above range
    psnrs, _ = _jit_batched(jnp.asarray(pred), jnp.asarray(target))
    clipped = np.clip(pred, 0, 1)
    want = np.array([
        _psnr_np(clipped[i, ..., 0].astype(np.float64), target[i, ..., 0].astype(np.float64))
        for i in range(2)
    ])
    np.testing.assert_allclose(np.asarray(psnrs), want, rtol=1e-4)
    l1 = float(_jit_l1(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(l1, 0.5, rtol=1e-5)


def test_batched_metrics_layouts():
    """NHW1 and single-channel NCHW both work; true multi-channel raises
    instead of silently squeezing the wrong axis."""
    import pytest
    from image_enhancement_deglaring_tpu.ops.metrics import batched_psnr_ssim

    rng = np.random.default_rng(0)
    a = rng.random((2, 16, 16, 1)).astype(np.float32)
    b = np.clip(a + 0.01, 0, 1).astype(np.float32)
    p1, s1 = batched_psnr_ssim(jnp.asarray(a), jnp.asarray(b))
    p2, s2 = batched_psnr_ssim(jnp.asarray(np.transpose(a, (0, 3, 1, 2))),
                               jnp.asarray(np.transpose(b, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    with pytest.raises(ValueError, match="single-channel"):
        batched_psnr_ssim(jnp.zeros((2, 16, 16, 3)), jnp.zeros((2, 16, 16, 3)))
