"""On-device image op tests (ops/image.py): grayscale, triptych split,
resize, dtype ladders, pad-to-multiple."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from image_enhancement_deglaring_tpu.ops import (
    from_uint8,
    pad_to_multiple,
    resize_bilinear,
    rgb_to_gray_luminance,
    split_triptych,
    to_uint8,
)


def test_luminance_matches_host_formula(rng):
    img = (rng.random((8, 8, 4)) * 255).astype(np.float32)
    got = np.asarray(jax.jit(rgb_to_gray_luminance)(jnp.asarray(img)))
    want = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    np.testing.assert_allclose(got[..., 0], want, rtol=1e-5)


def test_split_triptych(rng):
    img = rng.random((4, 12, 1)).astype(np.float32)
    gt, glared, mask = split_triptych(jnp.asarray(img))
    np.testing.assert_array_equal(np.asarray(gt), img[:, :4])
    np.testing.assert_array_equal(np.asarray(glared), img[:, 4:8])
    np.testing.assert_array_equal(np.asarray(mask), img[:, 8:12])


def test_resize_bilinear_identity_and_shape(rng):
    img = rng.random((16, 16, 1)).astype(np.float32)
    same = np.asarray(resize_bilinear(jnp.asarray(img), 16, 16))
    np.testing.assert_allclose(same, img, atol=1e-6)
    up = resize_bilinear(jnp.asarray(img), 32, 24)
    assert up.shape == (32, 24, 1)


def test_resize_bilinear_matches_cv2_on_downscale(rng):
    """The op documents cv2.resize(INTER_LINEAR) parity; jax's default
    antialias=True widens the downscale kernel and breaks it — this pins
    the 2x2-neighborhood convention on both directions."""
    cv2 = pytest.importorskip("cv2")
    img = rng.random((32, 32, 1)).astype(np.float32)
    down = np.asarray(resize_bilinear(jnp.asarray(img), 16, 16))[..., 0]
    want = cv2.resize(img[..., 0], (16, 16), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(down, want, atol=1e-5)
    up = np.asarray(resize_bilinear(jnp.asarray(img), 48, 40))[..., 0]
    want_up = cv2.resize(img[..., 0], (40, 48), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(up, want_up, atol=1e-5)


def test_uint8_ladder_roundtrip():
    u8 = jnp.arange(256, dtype=jnp.uint8).reshape(16, 16, 1)
    f = from_uint8(u8)
    assert float(f.min()) == 0.0 and float(f.max()) == 1.0
    back = to_uint8(f)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(u8))
    # clipping: out-of-range floats clamp
    over = jnp.asarray([[[1.5]], [[-0.5]]], jnp.float32)
    np.testing.assert_array_equal(np.asarray(to_uint8(over)).reshape(-1), [255, 0])


def test_pad_to_multiple():
    img = jnp.ones((5, 7, 1))
    padded, (h, w) = pad_to_multiple(img, 4)
    assert padded.shape == (8, 8, 1) and (h, w) == (5, 7)
    noop, _ = pad_to_multiple(jnp.ones((8, 8, 1)), 4)
    assert noop.shape == (8, 8, 1)
