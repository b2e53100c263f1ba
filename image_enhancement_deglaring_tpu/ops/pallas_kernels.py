"""Pallas TPU kernels for the hot non-matmul ops.

The U-Net's FLOPs live in convs (MXU territory — XLA already tiles those
well); GroupNorm -> SiLU is the bandwidth tail of every block: a reduction
pass plus an elementwise pass over the full activation
(reference equivalent: the GroupNorm+SiLU pairs of src/model.py:92-99).

Kernel design — two-phase streaming with H-tiling (whole-image slabs at
512x512 blow the VMEM budget once Mosaic materializes f32 temporaries):

- grid (N, phase, H_tiles); TPU grids iterate sequentially, so VMEM
  scratch persists across grid steps of the same image;
- phase 0 streams each (TH, W, C) tile and accumulates per-channel
  sum / sum-of-squares into a (2, C) float32 scratch accumulator;
- phase 1 re-streams the tiles, folds the accumulators into per-group
  mean / rsqrt(var + eps), and writes normalize+scale+swish output.

All accumulation is float32 regardless of input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_blocks import group_norm, silu

_DEFAULT_TILE_H = 64


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, acc_ref, *,
                    groups: int, eps: float, denom: float):
    p = pl.program_id(1)
    t = pl.program_id(2)
    c = x_ref.shape[-1]
    cg = c // groups

    @pl.when((p == 0) & (t == 0))
    def _reset():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(p == 0)
    def _accumulate():
        x = x_ref[0].astype(jnp.float32)  # (TH, W, C)
        acc_ref[0, :] += jnp.sum(x, axis=(0, 1))
        acc_ref[1, :] += jnp.sum(x * x, axis=(0, 1))

    @pl.when(p == 1)
    def _normalize():
        def per_group(v_c):  # (C,) -> group totals re-broadcast to (C,)
            v_g = jnp.sum(v_c.reshape(groups, cg), axis=1, keepdims=True)
            return jnp.broadcast_to(v_g, (groups, cg)).reshape(c)

        mean_c = per_group(acc_ref[0, :]) / denom
        ex2_c = per_group(acc_ref[1, :]) / denom
        var_c = ex2_c - mean_c * mean_c
        rstd_c = lax.rsqrt(var_c + eps)
        x = x_ref[0].astype(jnp.float32)
        y = (x - mean_c) * (rstd_c * scale_ref[0].astype(jnp.float32))
        y = y + bias_ref[0].astype(jnp.float32)
        o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "tile_h", "interpret"))
def _fused_gn_silu_pallas(x, scale, bias, *, num_groups: int, eps: float,
                          tile_h: int = _DEFAULT_TILE_H, interpret: bool = False):
    n, h, w, c = x.shape
    tile_h = min(tile_h, h)
    if h % tile_h != 0:  # fall back to one tile if H doesn't split evenly
        tile_h = h
    n_tiles = h // tile_h
    cg = c // num_groups
    denom = float(h * w * cg)

    kernel = functools.partial(_gn_silu_kernel, groups=num_groups, eps=eps,
                               denom=denom)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n, 2, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda i, p, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, p, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, p, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, c), lambda i, p, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=interpret,
    )(x, scale.reshape(1, c), bias.reshape(1, c))


def _conv_gn_silu_kernel(x_ref, w_ref, scale_ref, bias_ref, o_ref,
                         xpad_ref, *, groups: int, eps: float):
    """One image: 3x3 same conv (9 MXU matmuls over shifted views) + GN +
    SiLU, all resident in VMEM — zero HBM intermediates."""
    h, w, cin = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cout = o_ref.shape[3]
    cg = cout // groups
    denom = float(h * w * cg)

    xpad_ref[...] = jnp.zeros_like(xpad_ref)
    xpad_ref[1 : h + 1, 1 : w + 1, :] = x_ref[0]

    acc = jnp.zeros((h * w, cout), jnp.float32)
    for k in range(9):
        dy, dx = k // 3, k % 3
        patch = xpad_ref[dy : dy + h, dx : dx + w, :].reshape(h * w, cin)
        acc += jnp.dot(patch, w_ref[k], preferred_element_type=jnp.float32)

    def per_group(v_c):
        v_g = jnp.sum(v_c.reshape(groups, cg), axis=1, keepdims=True)
        return jnp.broadcast_to(v_g, (groups, cg)).reshape(cout)

    mean_c = per_group(jnp.sum(acc, axis=0)) / denom
    d = acc - mean_c
    rstd_c = lax.rsqrt(per_group(jnp.sum(d * d, axis=0)) / denom + eps)
    y = d * (rstd_c * scale_ref[0].astype(jnp.float32))
    y = y + bias_ref[0].astype(jnp.float32)
    y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.reshape(h, w, cout).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "interpret"))
def _fused_conv_gn_silu_pallas(x, w, scale, bias, *, num_groups: int,
                               eps: float, interpret: bool = False):
    """x: (N,H,W,Cin) NHWC; w: (3,3,Cin,Cout) HWIO -> (N,H,W,Cout)."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    w9 = w.astype(x.dtype).reshape(9, cin, cout)
    kernel = functools.partial(_conv_gn_silu_kernel, groups=num_groups, eps=eps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, wd, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wd, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h + 2, wd + 2, cin), x.dtype)],
        interpret=interpret,
    )(x, w9, scale.reshape(1, cout), bias.reshape(1, cout))


#: Per-image VMEM budget for the fused conv block (padded input + f32
#: accumulator + weights + output, with pipelining headroom).
_CONV_VMEM_LIMIT = 6 * 1024 * 1024


def fused_conv3x3_gn_silu(x: jax.Array, w: jax.Array, scale: jax.Array,
                          bias: jax.Array, *, num_groups: int,
                          eps: float = 1e-5,
                          use_pallas: bool | None = None) -> jax.Array:
    """Conv3x3(same, no bias) -> GroupNorm -> SiLU, fully fused on TPU.

    Auto-dispatch targets the U-Net's high-channel levels (the MXU-friendly
    regime: C >= 64 lanes, small spatial slabs that sit in VMEM); elsewhere
    it falls back to the XLA composition in ops.conv_blocks.
    """
    from .conv_blocks import conv2d

    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    slab = (
        (h + 2) * (wd + 2) * cin * x.dtype.itemsize
        + h * wd * cout * 4
        + 9 * cin * cout * x.dtype.itemsize
        + 2 * h * wd * max(cin, cout) * x.dtype.itemsize
    )
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and cout % num_groups == 0
            and cout >= 64
            and slab <= _CONV_VMEM_LIMIT
        )
    if not use_pallas:
        y = conv2d(x, w, padding=1)
        return silu(group_norm(y, scale, bias, num_groups=num_groups, eps=eps))
    interpret = jax.default_backend() != "tpu"
    return _fused_conv_gn_silu_pallas(x, w, scale, bias, num_groups=num_groups,
                                      eps=eps, interpret=interpret)


def fused_group_norm_silu(x: jax.Array, scale: jax.Array, bias: jax.Array, *,
                          num_groups: int, eps: float = 1e-5,
                          use_pallas: bool | None = None) -> jax.Array:
    """GroupNorm followed by SiLU, fused on TPU via Pallas.

    ``use_pallas=None`` auto-selects: Pallas on TPU backends (any size —
    the kernel streams H tiles), XLA elsewhere. Numerics are validated
    equivalent to group_norm+silu (see tests/test_pallas.py).
    """
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu" and x.shape[-1] % num_groups == 0
        )
    if not use_pallas:
        return silu(group_norm(x, scale, bias, num_groups=num_groups, eps=eps))
    interpret = jax.default_backend() != "tpu"
    return _fused_gn_silu_pallas(x, scale, bias, num_groups=num_groups,
                                 eps=eps, interpret=interpret)
