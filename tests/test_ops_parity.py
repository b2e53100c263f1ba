"""Numerical parity of core NHWC ops against torch functional references.

These pin the building blocks to the exact semantics the reference model
relies on (reference: src/model.py:92-99 conv/GN/SiLU blocks, :35 AvgPool,
:47-53 ConvTranspose2d(k=2,s=2)). torch here is CPU-only and test-only —
the framework itself never imports it.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from image_enhancement_deglaring_tpu.ops import (  # noqa: E402
    avg_pool_2x2,
    conv2d,
    group_norm,
    max_pool_2x2,
    resolve_group_count,
    silu,
    upsample2x_matmul,
    upsample_nearest_2x,
)


def nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 16, 16, 5), dtype=np.float32)
    w_oihw = rng.standard_normal((7, 5, 3, 3), dtype=np.float32)
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w_hwio), padding=1))
    want = to_nhwc(F.conv2d(nchw(x), torch.from_numpy(w_oihw), padding=1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv2d_dilated_matches_torch(rng):
    x = rng.standard_normal((1, 20, 20, 4), dtype=np.float32)
    w_oihw = rng.standard_normal((6, 4, 3, 3), dtype=np.float32)
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w_hwio), padding=2, dilation=2))
    want = to_nhwc(F.conv2d(nchw(x), torch.from_numpy(w_oihw), padding=2, dilation=2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("channels,groups", [(8, 8), (16, 8), (12, 8), (6, 8)])
def test_group_norm_matches_torch(rng, channels, groups):
    g = resolve_group_count(channels, groups)
    x = rng.standard_normal((2, 10, 10, channels), dtype=np.float32) * 3 + 1
    scale = rng.standard_normal(channels).astype(np.float32)
    bias = rng.standard_normal(channels).astype(np.float32)
    got = np.asarray(
        group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), num_groups=g)
    )
    want = to_nhwc(
        F.group_norm(nchw(x), g, torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_silu_matches_torch(rng):
    x = rng.standard_normal((4, 7, 7, 3), dtype=np.float32)
    got = np.asarray(silu(jnp.asarray(x)))
    want = F.silu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_avg_pool_matches_torch(rng):
    x = rng.standard_normal((2, 12, 12, 5), dtype=np.float32)
    got = np.asarray(avg_pool_2x2(jnp.asarray(x)))
    want = to_nhwc(F.avg_pool2d(nchw(x), 2, 2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_max_pool_matches_torch(rng):
    x = rng.standard_normal((2, 12, 12, 5), dtype=np.float32)
    got = np.asarray(max_pool_2x2(jnp.asarray(x)))
    want = to_nhwc(F.max_pool2d(nchw(x), 2, 2))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_upsample2x_matmul_matches_conv_transpose(rng):
    x = rng.standard_normal((2, 6, 6, 10), dtype=np.float32)
    w = rng.standard_normal((10, 4, 2, 2), dtype=np.float32)  # torch (I, O, 2, 2)
    b = rng.standard_normal(4).astype(np.float32)
    got = np.asarray(upsample2x_matmul(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    want = to_nhwc(
        F.conv_transpose2d(nchw(x), torch.from_numpy(w), torch.from_numpy(b), stride=2)
    )
    assert got.shape == (2, 12, 12, 4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upsample_nearest_matches_torch(rng):
    x = rng.standard_normal((2, 5, 5, 3), dtype=np.float32)
    got = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    want = to_nhwc(F.interpolate(nchw(x), scale_factor=2, mode="nearest"))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize(
    "features,num_groups,expected",
    [(8, 8, 8), (16, 8, 8), (4, 8, 4), (6, 8, 6), (12, 8, 6), (10, 8, 5), (7, 8, 7)],
)
def test_resolve_group_count_rule(features, num_groups, expected):
    # Mirrors the reference's largest-divisor rule (reference: src/model.py:71-86)
    assert resolve_group_count(features, num_groups) == expected
