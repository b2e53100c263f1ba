"""Fused Pallas GroupNorm+SiLU: numerical equivalence with the XLA path
(kernel runs in interpret mode on the CPU test backend)."""

import numpy as np
import pytest
import jax.numpy as jnp

from image_enhancement_deglaring_tpu.ops.conv_blocks import group_norm, silu
from image_enhancement_deglaring_tpu.ops.pallas_kernels import (
    _fused_gn_silu_pallas,
    fused_group_norm_silu,
)


@pytest.mark.parametrize("shape,groups", [
    ((2, 16, 16, 8), 8),
    ((1, 8, 8, 32), 8),
    ((3, 4, 4, 16), 4),
])
def test_fused_matches_xla(rng, shape, groups):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 2 + 0.5)
    c = shape[-1]
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    want = silu(group_norm(x, scale, bias, num_groups=groups))
    got = _fused_gn_silu_pallas(x, scale, bias, num_groups=groups, eps=1e-5,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_bf16_io(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)).astype(np.float32))
    scale = jnp.ones(8)
    bias = jnp.zeros(8)
    got = _fused_gn_silu_pallas(x.astype(jnp.bfloat16), scale, bias,
                                num_groups=8, eps=1e-5, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = silu(group_norm(x, scale, bias, num_groups=8))
    np.testing.assert_allclose(
        np.asarray(got).astype(np.float32), np.asarray(want), atol=0.05
    )


def test_dispatcher_falls_back_on_cpu(rng):
    # on the CPU test backend, auto mode must use the XLA path
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
    got = fused_group_norm_silu(x, jnp.ones(8), jnp.zeros(8), num_groups=8)
    want = silu(group_norm(x, jnp.ones(8), jnp.zeros(8), num_groups=8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


# ------------------------------------------------- fused conv3x3 + GN + SiLU


from image_enhancement_deglaring_tpu.ops.conv_blocks import conv2d
from image_enhancement_deglaring_tpu.ops.pallas_kernels import (
    _fused_conv_gn_silu_pallas,
    fused_conv3x3_gn_silu,
)


@pytest.mark.parametrize("shape,cout,groups", [
    ((2, 8, 8, 16), 32, 8),
    ((1, 16, 16, 64), 128, 8),
    ((3, 8, 8, 8), 8, 8),
])
def test_fused_conv_matches_xla(rng, shape, cout, groups):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    cin = shape[-1]
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    want = silu(group_norm(conv2d(x, w, padding=1), scale, bias, num_groups=groups))
    got = _fused_conv_gn_silu_pallas(x, w, scale, bias, num_groups=groups,
                                     eps=1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("images", [2, 4])
def test_fused_conv_batched_grid_matches_per_image(rng, images):
    """The batched-grid variant (K images per grid step, opt-in via
    images_per_step) stays exact vs the XLA composition."""
    from image_enhancement_deglaring_tpu.ops.pallas_kernels import (
        _fused_conv_gn_silu_batched,
    )

    x = jnp.asarray(rng.standard_normal((4, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 32)).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    want = silu(group_norm(conv2d(x, w, padding=1), scale, bias, num_groups=8))
    got = _fused_conv_gn_silu_batched(x, w, scale, bias, num_groups=8,
                                      eps=1e-5, images=images, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_conv_dispatcher_rejects_bad_images_per_step(rng):
    x = jnp.asarray(rng.standard_normal((3, 8, 8, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * 0.1)
    with pytest.raises(ValueError, match="images_per_step"):
        fused_conv3x3_gn_silu(x, w, jnp.ones(64), jnp.zeros(64), num_groups=8,
                              use_pallas=True, images_per_step=2)


def test_fused_conv_dispatcher_falls_back_on_cpu(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * 0.1)
    got = fused_conv3x3_gn_silu(x, w, jnp.ones(64), jnp.zeros(64), num_groups=8)
    want = silu(group_norm(conv2d(x, w, padding=1), jnp.ones(64), jnp.zeros(64),
                           num_groups=8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


# ------------------------------------- flat single-HBM-pass GroupNorm+SiLU


from image_enhancement_deglaring_tpu.ops.pallas_kernels import (
    _flat_eligible,
    _fused_gn_silu_flat,
    _pick_tile_h,
)


@pytest.mark.parametrize("shape,groups", [
    ((2, 64, 64, 8), 8),    # enc1 geometry: low C, W*C lane-aligned
    ((2, 32, 32, 16), 8),   # enc2 geometry
    ((1, 16, 16, 128), 8),  # bottleneck geometry
    ((2, 24, 48, 32), 8),   # non-square, H not a power of two
    ((3, 8, 16, 8), 4),
])
def test_flat_gn_silu_matches_xla(rng, shape, groups):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 2 + 0.5)
    n, h, w, c = shape
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    want = silu(group_norm(x, scale, bias, num_groups=groups))
    got = _fused_gn_silu_flat(
        x.reshape(n, h, w * c), scale, bias, w=w, num_groups=groups,
        eps=1e-5, tile_h=_pick_tile_h(h, w * c), interpret=True,
    ).reshape(shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flat_gn_silu_bf16(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    got = _fused_gn_silu_flat(
        x.astype(jnp.bfloat16).reshape(2, 16, 128), jnp.ones(8), jnp.zeros(8),
        w=16, num_groups=8, eps=1e-5, tile_h=16, interpret=True,
    )
    assert got.dtype == jnp.bfloat16
    want = silu(group_norm(x.astype(jnp.bfloat16).astype(jnp.float32),
                           jnp.ones(8), jnp.zeros(8), num_groups=8))
    np.testing.assert_allclose(np.asarray(got).astype(np.float32).reshape(want.shape),
                               np.asarray(want), atol=0.06)


def test_flat_eligibility_covers_every_unet_level():
    """W*C == 4096 at every production level -> all flat-eligible in bf16."""
    levels = [(512, 512, 8), (256, 256, 16), (128, 128, 32),
              (64, 64, 64), (32, 32, 128)]
    for h, w, c in levels:
        x = jnp.zeros((1, h, w, c), jnp.bfloat16)
        assert _flat_eligible(x, 8), (h, w, c)
        assert (w * c) == 4096
    # f32 at 512^2 is fine too (streaming row tiles, not whole-slab VMEM)
    assert _flat_eligible(jnp.zeros((1, 512, 512, 8), jnp.float32), 8)
    # lane-misaligned W*C is not
    assert not _flat_eligible(jnp.zeros((1, 64, 5, 10), jnp.float32), 2)


def test_pick_tile_h_divides():
    for h in [8, 24, 512, 100, 96]:
        t = _pick_tile_h(h, 4096)
        assert h % t == 0 and t >= 1


def test_fused_conv_forced_rejects_bad_groups(rng):
    """use_pallas=True must not silently compute ragged pseudo-group GN."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * 0.1)
    with pytest.raises(ValueError, match="num_groups"):
        fused_conv3x3_gn_silu(x, w, jnp.ones(64), jnp.zeros(64), num_groups=5,
                              use_pallas=True)


# ---------------------------------------------- whole-slice dec1+out kernel


def test_fused_dec1_output_matches_xla_f32():
    """The 3-phase VMEM-resident decoder-tail kernel (conv1-dual + GN +
    SiLU + conv2 + GN + SiLU + 1x1 out) matches the XLA composition
    exactly in f32 (interpret mode off-TPU)."""
    from image_enhancement_deglaring_tpu.ops.pallas_dec1 import (
        dec1_output_xla,
        fused_dec1_output,
    )

    rng = np.random.default_rng(3)
    B, C, H, W = 2, 8, 64, 128
    f = lambda *sh, s=1.0: (rng.standard_normal(sh) * s).astype(np.float32)
    xu, xs = f(B, H, W, C), f(B, H, W, C)
    wa, wb, w2 = f(3, 3, C, C, s=.2), f(3, 3, C, C, s=.2), f(3, 3, C, C, s=.2)
    g1s, g1b, g2s, g2b = f(C), f(C), f(C), f(C)
    wo, bo = f(1, 1, C, 1, s=.3), f(1)
    want = np.asarray(dec1_output_xla(
        jnp.asarray(xu), jnp.asarray(xs), wa, wb, w2,
        g1s, g1b, g2s, g2b, wo, bo))
    got = np.asarray(fused_dec1_output(
        jnp.asarray(xu.transpose(0, 3, 1, 2)),
        jnp.asarray(xs.transpose(0, 3, 1, 2)),
        wa, wb, w2, g1s, g1b, g2s, g2b, wo, bo,
        tile_h=16, interpret=True))[..., None]
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_fused_dec1_output_single_tile_and_odd_tiling():
    """tile_h that doesn't divide H falls back to one whole-image tile;
    both paths agree with XLA (edge-row handling differs between them)."""
    from image_enhancement_deglaring_tpu.ops.pallas_dec1 import (
        dec1_output_xla,
        fused_dec1_output,
    )

    rng = np.random.default_rng(4)
    B, C, H, W = 1, 8, 48, 128
    f = lambda *sh, s=1.0: (rng.standard_normal(sh) * s).astype(np.float32)
    xu, xs = f(B, H, W, C), f(B, H, W, C)
    wa, wb, w2 = f(3, 3, C, C, s=.2), f(3, 3, C, C, s=.2), f(3, 3, C, C, s=.2)
    g1s, g1b, g2s, g2b = f(C), f(C), f(C), f(C)
    wo, bo = f(1, 1, C, 1, s=.3), f(1)
    want = np.asarray(dec1_output_xla(
        jnp.asarray(xu), jnp.asarray(xs), wa, wb, w2,
        g1s, g1b, g2s, g2b, wo, bo))
    xuc = jnp.asarray(xu.transpose(0, 3, 1, 2))
    xsc = jnp.asarray(xs.transpose(0, 3, 1, 2))
    for th in (48, 7, 16):  # whole-image, non-divisor fallback, 3 tiles
        got = np.asarray(fused_dec1_output(
            xuc, xsc, wa, wb, w2, g1s, g1b, g2s, g2b, wo, bo,
            tile_h=th, interpret=True))[..., None]
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5,
                                   err_msg=f"tile_h={th}")
