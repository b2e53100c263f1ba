"""Native C++ preprocessing: availability, parity with the numpy path,
and batch/thread correctness."""

import os

import numpy as np
import pytest

from image_enhancement_deglaring_tpu import native
from image_enhancement_deglaring_tpu.data.pipeline import (
    decode_inference_image,
    _resize_uint8,
    _to_gray_uint8,
    decode_triptych,
)
from image_enhancement_deglaring_tpu.data.synthetic import make_triptych

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="g++ toolchain unavailable"
)


def _numpy_reference(img, out_size):
    third = img.shape[1] // 3
    gt = _to_gray_uint8(img[:, :third])
    glared = _to_gray_uint8(img[:, third : 2 * third])
    gt = _resize_uint8(gt, out_size).astype(np.float32) / 255.0
    glared = _resize_uint8(glared, out_size).astype(np.float32) / 255.0
    return glared, gt


def test_native_matches_numpy_identity_size(rng):
    img = make_triptych(rng, size=64)
    glared_n, gt_n = native.triptych_preprocess(img, 64)
    glared_p, gt_p = _numpy_reference(img, 64)
    np.testing.assert_array_equal(glared_n, glared_p)
    np.testing.assert_array_equal(gt_n, gt_p)


def test_native_resize_close_to_cv2(rng):
    img = make_triptych(rng, size=64)
    glared_n, gt_n = native.triptych_preprocess(img, 48)
    glared_p, gt_p = _numpy_reference(img, 48)
    # both are half-pixel bilinear quantized through uint8; the only
    # residual is cv2's fixed-point (11-bit coeff) tie rounding: <=1 step
    assert np.abs(glared_n - glared_p).max() <= 1.5 / 255.0
    assert np.abs(gt_n - gt_p).max() <= 1.5 / 255.0


def test_native_batch_matches_single(rng):
    imgs = np.stack([make_triptych(rng, size=32) for _ in range(6)])
    g_b, t_b = native.triptych_preprocess_batch(imgs, 32, n_threads=4)
    for i in range(6):
        g_s, t_s = native.triptych_preprocess(imgs[i], 32)
        np.testing.assert_array_equal(g_b[i], g_s)
        np.testing.assert_array_equal(t_b[i], t_s)


def test_inference_preprocess_gray_and_rgb(rng):
    rgb = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    out = native.inference_preprocess(rgb, 40)
    want = _to_gray_uint8(rgb).astype(np.float32) / 255.0
    np.testing.assert_array_equal(out, want)
    gray = (rng.random((40, 40)) * 255).astype(np.uint8)
    out2 = native.inference_preprocess(gray, 40)
    np.testing.assert_array_equal(out2, gray.astype(np.float32) / 255.0)


def test_decode_triptych_uses_native(tmp_path, rng):
    from PIL import Image

    img = make_triptych(rng, size=64)
    p = str(tmp_path / "t.png")
    Image.fromarray(img, mode="RGBA").save(p)
    glared_native, gt_native = decode_triptych(p, 64, use_native=True)
    glared_py, gt_py = decode_triptych(p, 64, use_native=False)
    np.testing.assert_array_equal(glared_native, glared_py)
    np.testing.assert_array_equal(gt_native, gt_py)


# ------------------------------------------- round-3 native review fixes


def test_triptych_too_narrow_raises_not_segfaults():
    """A triptych narrower than 3px makes third == 0; the wrapper must
    raise (the C++ resize would otherwise clamp sample coords to -1 and
    read out of bounds)."""
    img = np.zeros((4, 2, 4), np.uint8)
    with pytest.raises(ValueError, match="too small"):
        native.triptych_preprocess(img, 16)
    with pytest.raises(ValueError, match="too small"):
        native.triptych_preprocess_batch(img[None], 16)


def test_decode_inference_image_uses_native(rng):
    """The single-image inference path runs in the native library when
    available (like decode_triptych); the numpy fallback agrees to within
    one uint8 quantization step."""
    img = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
    got = decode_inference_image(img, image_size=32)          # native
    want = decode_inference_image(img, image_size=32, use_native=False)
    assert got.shape == want.shape == (32, 32)
    np.testing.assert_allclose(got, want, atol=1.6 / 255.0)


def test_native_rebuild_is_atomic(tmp_path, monkeypatch):
    """An interrupted build must not leave a corrupt libtriptych.so that is
    newer than the source (which would disable the native path forever):
    the compiler writes to a temp file that is renamed into place."""
    import image_enhancement_deglaring_tpu.native as nat

    calls = {}
    real_run = nat.subprocess.run

    def spy(cmd, **kw):
        calls["out"] = cmd[cmd.index("-o") + 1]
        raise RuntimeError("interrupted build")

    monkeypatch.setattr(nat.subprocess, "run", spy)
    assert nat._build() is False
    assert calls["out"] != nat._LIB_PATH  # compiled to a temp path
    assert not os.path.exists(calls["out"])  # and cleaned up on failure
    monkeypatch.setattr(nat.subprocess, "run", real_run)
