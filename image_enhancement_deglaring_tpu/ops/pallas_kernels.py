"""Pallas TPU kernels for the hot non-matmul ops.

The U-Net's FLOPs live in convs (MXU territory — XLA already tiles those
well); GroupNorm -> SiLU is the bandwidth tail of every block: a reduction
pass plus an elementwise pass over the full activation
(reference equivalent: the GroupNorm+SiLU pairs of src/model.py:92-99).

Mosaic-specific shape discipline (learned the hard way):
- no 1-D <-> 2-D reshapes, no reshapes of strided views ("unsupported
  shape cast"); everything stays >= 2-D;
- per-group statistics therefore use a (C, C) 0/1 *group-mask matmul*:
  ``sums_per_channel @ M`` simultaneously group-reduces and broadcasts
  back to per-channel lanes (M[i,j] = 1 iff channel i and j share a
  group) — one tiny MXU op instead of reshape/broadcast gymnastics.

Kernels:
- ``_gn_silu_pallas``: two-phase streaming GroupNorm+SiLU with H-tiling
  and f32 VMEM accumulators (handles arbitrarily large slabs).
- ``_fused_conv_gn_silu_pallas``: whole [Conv3x3 -> GN -> SiLU] in one
  kernel per image: 9 shifted-view MXU contractions accumulate the conv in
  f32, statistics + swish apply in VMEM, single HBM write. For the
  high-channel levels whose slabs fit VMEM.

All accumulation is float32 regardless of input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_blocks import group_norm, silu

_DEFAULT_TILE_H = 64


def _group_mask(c: int, groups: int) -> np.ndarray:
    """(C, C) float32: M[i, j] = 1 iff i and j belong to the same group."""
    g = np.arange(c) // (c // groups)
    return (g[:, None] == g[None, :]).astype(np.float32)


def _sum_hw(x):
    """(H, W, C) -> (1, C) without creating 1-D intermediates."""
    t = jnp.sum(x, axis=0)  # (W, C)
    return jnp.sum(t, axis=0, keepdims=True)  # (1, C)


# ------------------------------------------------- streaming GroupNorm+SiLU


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, gmask_ref, o_ref, acc_ref, *,
                    eps: float, denom: float):
    p = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when((p == 0) & (t == 0))
    def _reset():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(p == 0)
    def _accumulate():
        x = x_ref[0].astype(jnp.float32)  # (TH, W, C)
        acc_ref[0:1, :] += _sum_hw(x)
        acc_ref[1:2, :] += _sum_hw(x * x)

    @pl.when(p == 1)
    def _normalize():
        gmask = gmask_ref[...]
        mean_c = jnp.dot(acc_ref[0:1, :], gmask,
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST) / denom  # (1, C)
        ex2_c = jnp.dot(acc_ref[1:2, :], gmask,
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST) / denom
        var_c = ex2_c - mean_c * mean_c
        rstd_c = lax.rsqrt(var_c + eps)
        x = x_ref[0].astype(jnp.float32)
        y = (x - mean_c) * (rstd_c * scale_ref[...].astype(jnp.float32))
        y = y + bias_ref[...].astype(jnp.float32)
        y = y * jax.nn.sigmoid(y)
        o_ref[0] = y.astype(o_ref.dtype)


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

    kernel = functools.partial(_gn_silu_kernel, eps=eps, denom=denom)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n, 2, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda i, p, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, p, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, p, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, p, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, c), lambda i, p, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=interpret,
    )(x, scale.reshape(1, c), bias.reshape(1, c),
      jnp.asarray(_group_mask(c, num_groups)))


def fused_group_norm_silu(x: jax.Array, scale: jax.Array, bias: jax.Array, *,
                          num_groups: int, eps: float = 1e-5,
                          use_pallas: bool | None = None) -> jax.Array:
    """GroupNorm followed by SiLU, fused on TPU via Pallas.

    ``use_pallas=None`` auto-selects: Pallas on TPU backends (any size —
    the kernel streams H tiles), XLA elsewhere. Numerics are validated
    equivalent to group_norm+silu (see tests/test_pallas.py).
    """
    if use_pallas is None:
        # C < 64 pads catastrophically on the 128-lane dim (the tile layout
        # blows the scoped-VMEM budget); leave those to XLA.
        use_pallas = (
            jax.default_backend() == "tpu"
            and x.shape[-1] % num_groups == 0
            and x.shape[-1] >= 64
        )
    if not use_pallas:
        return silu(group_norm(x, scale, bias, num_groups=num_groups, eps=eps))
    interpret = jax.default_backend() != "tpu"
    return _fused_gn_silu_pallas(x, scale, bias, num_groups=num_groups,
                                 eps=eps, interpret=interpret)


# ------------------------------------------------- fused conv3x3 + GN + SiLU


def _conv_gn_silu_kernel(x_ref, w_ref, scale_ref, bias_ref, gmask_ref, o_ref,
                         xpad_ref, *, eps: float, denom: float,
                         conv_precision):
    """One image: 3x3 same conv (9 MXU contractions over shifted views) +
    GN + SiLU, all resident in VMEM — zero HBM intermediates."""
    h, w, cin = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cout = o_ref.shape[3]

    xpad_ref[...] = jnp.zeros_like(xpad_ref)
    xpad_ref[1 : h + 1, 1 : w + 1, :] = x_ref[0]

    acc = jnp.zeros((h, w, cout), jnp.float32)
    for k in range(9):
        dy, dx = k // 3, k % 3
        patch = xpad_ref[dy : dy + h, dx : dx + w, :]
        acc += lax.dot_general(
            patch, w_ref[k],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=conv_precision,
        )

    gmask = gmask_ref[...]
    sum_c = _sum_hw(acc)
    mean_c = jnp.dot(sum_c, gmask, preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST) / denom
    d = acc - mean_c  # (H, W, C) - (1, C) broadcasts on trailing dims
    var_c = jnp.dot(_sum_hw(d * d), gmask, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST) / denom
    rstd_c = lax.rsqrt(var_c + eps)
    y = d * (rstd_c * scale_ref[...].astype(jnp.float32))
    y = y + bias_ref[...].astype(jnp.float32)
    y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "interpret"))
def _fused_conv_gn_silu_pallas(x, w, scale, bias, *, num_groups: int,
                               eps: float, interpret: bool = False):
    """x: (N,H,W,Cin) NHWC; w: (3,3,Cin,Cout) HWIO -> (N,H,W,Cout)."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    w9 = w.astype(x.dtype).reshape(9, cin, cout)
    denom = float(h * wd * (cout // num_groups))
    # HIGHEST keeps f32 operands exact; Mosaic rejects it for bf16 lhs
    # ("Bad lhs type"), where DEFAULT is already the native bf16 MXU path.
    conv_precision = (
        lax.Precision.HIGHEST if x.dtype == jnp.float32 else lax.Precision.DEFAULT
    )
    kernel = functools.partial(_conv_gn_silu_kernel, eps=eps, denom=denom,
                               conv_precision=conv_precision)
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
            pl.BlockSpec((cout, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wd, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h + 2, wd + 2, cin), x.dtype)],
        interpret=interpret,
    )(x, w9, scale.reshape(1, cout), bias.reshape(1, cout),
      jnp.asarray(_group_mask(cout, num_groups)))


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
