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
        # p*t: every phase-0 step aliases tile 0's slot, which phase 1
        # rewrites before it is ever flushed -> no phantom stores (same
        # trick as the flat kernel below; phase 0 never writes o_ref)
        out_specs=pl.BlockSpec((1, tile_h, w, c),
                               lambda i, p, t: (i, p * t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=interpret,
    )(x, scale.reshape(1, c), bias.reshape(1, c),
      jnp.asarray(_group_mask(c, num_groups)))


def _flat_eligible(x, num_groups: int) -> bool:
    n, h, w, c = x.shape
    wc = w * c
    return c % num_groups == 0 and wc % 128 == 0 and h >= 8


def fused_group_norm_silu(x: jax.Array, scale: jax.Array, bias: jax.Array, *,
                          num_groups: int, eps: float = 1e-5,
                          use_pallas: bool | None = None) -> jax.Array:
    """GroupNorm followed by SiLU, fused on TPU via Pallas.

    ``use_pallas=None`` auto-selects: the flat streaming kernel when the
    flattened (H, W*C) row is 128-lane aligned (every level of the
    production U-Net qualifies, including C=8 at 512^2); the channel-
    padded streaming kernel for other high-channel shapes; XLA elsewhere.
    Numerics validated equivalent to group_norm+silu (tests/test_pallas.py).

    Measured guidance (docs/PERF.md §7): standalone this beats XLA's
    standalone lowering at most levels, but XLA fuses the GN epilogue
    into a *producing conv*, so inside conv pipelines the XLA composition
    wins — which is why the model's ``pallas_gn`` knob defaults off.
    """
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    if use_pallas is None or use_pallas:
        flat_ok = _flat_eligible(x, num_groups)
        stream_ok = x.shape[-1] % num_groups == 0 and x.shape[-1] >= 64
        if use_pallas is None and not on_tpu:
            flat_ok = stream_ok = False  # XLA off-TPU unless forced
        if flat_ok:
            n, h, w, c = x.shape
            wc = w * c
            y = _fused_gn_silu_flat(
                x.reshape(n, h, wc), scale, bias, w=w, num_groups=num_groups,
                eps=eps, tile_h=_pick_tile_h(h, wc), interpret=interpret,
            )
            return y.reshape(x.shape)
        if stream_ok:
            return _fused_gn_silu_pallas(x, scale, bias,
                                         num_groups=num_groups, eps=eps,
                                         interpret=interpret)
        if use_pallas:
            raise ValueError(
                f"no Pallas GN+SiLU path for shape {x.shape}, "
                f"groups={num_groups}"
            )
    return silu(group_norm(x, scale, bias, num_groups=num_groups, eps=eps))


# ----------------------------------------- flat single-HBM-pass GroupNorm+SiLU
#
# Key observation for this U-Net: W*C == 4096 at EVERY level (spatial halves
# exactly as channels double), so flattening (B, H, W, C) -> (B, H, W*C)
# makes every GN site perfectly 128-lane aligned — including the 512^2 C=8
# level that the padded-channel layout excluded (C=8 pads 16x on lanes).
# Per-group statistics reduce over lanes with a tiny (W*C, G) 0/1 mask
# matmul and broadcast back with its transpose.
#
# Traffic: ONE HBM read + ONE HBM write per activation. The whole flattened
# image sits in VMEM in the compute dtype; the two statistical passes run
# over VMEM-resident row tiles (f32 temporaries stay tile-sized, avoiding
# the whole-slab f32 materialization that OOM'd the naive version). XLA's
# lowering is 2 reads + 1 write (reduce pass + apply pass), so this saves
# a third of the GN+SiLU bandwidth — the measured tail of every block.


def _lane_masks(w: int, c: int, groups: int):
    """(W*C, G) one-hot lane->group and its (G, W*C) transpose."""
    lane_ch = np.arange(w * c) % c
    lane_g = lane_ch // (c // groups)
    l2g = (lane_g[:, None] == np.arange(groups)[None, :]).astype(np.float32)
    return l2g, np.ascontiguousarray(l2g.T)


def _gn_silu_flat_kernel(x_ref, sl_ref, bl_ref, l2g_ref, g2l_ref, o_ref,
                         acc_ref, *, eps: float, denom: float):
    """Two-phase streaming over row tiles of the flattened (H, W*C) image:
    phase 0 accumulates per-lane sums; phase 1 finalizes the per-lane
    affine (a, b) once, then applies normalize+SiLU tile by tile. The
    output block index is p*t, so phase 0 never stores a phantom tile —
    HBM traffic is exactly 2 reads + 1 write, in one fused kernel."""
    p = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when((p == 0) & (t == 0))
    def _reset():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(p == 0)
    def _accumulate():
        xt = x_ref[0].astype(jnp.float32)  # (TH, WC)
        acc_ref[0:1, :] += jnp.sum(xt, axis=0, keepdims=True)
        acc_ref[1:2, :] += jnp.sum(xt * xt, axis=0, keepdims=True)

    @pl.when((p == 1) & (t == 0))
    def _finalize():
        sum_g = jnp.dot(acc_ref[0:1, :], l2g_ref[...],
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
        sum2_g = jnp.dot(acc_ref[1:2, :], l2g_ref[...],
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
        mean_g = sum_g / denom
        var_g = sum2_g / denom - mean_g * mean_g
        rstd_g = lax.rsqrt(var_g + eps)
        mean_l = jnp.dot(mean_g, g2l_ref[...],
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
        rstd_l = jnp.dot(rstd_g, g2l_ref[...],
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
        a_l = rstd_l * sl_ref[...].astype(jnp.float32)
        b_l = bl_ref[...].astype(jnp.float32) - mean_l * a_l
        acc_ref[0:1, :] = a_l  # reuse the accumulator as (a, b) storage
        acc_ref[1:2, :] = b_l

    @pl.when(p == 1)
    def _apply():
        xt = x_ref[0].astype(jnp.float32)
        y = xt * acc_ref[0:1, :] + acc_ref[1:2, :]
        o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("w", "num_groups", "eps",
                                             "tile_h", "interpret"))
def _fused_gn_silu_flat(x_flat, scale, bias, *, w: int, num_groups: int,
                        eps: float, tile_h: int, interpret: bool = False):
    """x_flat: (N, H, W*C); scale/bias: (C,)."""
    n, h, wc = x_flat.shape
    c = wc // w
    denom = float(h * w * (c // num_groups))
    l2g, g2l = _lane_masks(w, c, num_groups)
    scale_l = jnp.tile(scale.astype(jnp.float32), w).reshape(1, wc)
    bias_l = jnp.tile(bias.astype(jnp.float32), w).reshape(1, wc)
    n_tiles = h // tile_h

    kernel = functools.partial(_gn_silu_flat_kernel, eps=eps, denom=denom)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x_flat.shape, x_flat.dtype),
        grid=(n, 2, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_h, wc), lambda i, p, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda i, p, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda i, p, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wc, num_groups), lambda i, p, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_groups, wc), lambda i, p, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # p*t: every phase-0 step aliases tile 0's slot, which phase 1
        # rewrites before it is ever flushed -> no phantom stores
        out_specs=pl.BlockSpec((1, tile_h, wc), lambda i, p, t: (i, p * t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, wc), jnp.float32)],
        interpret=interpret,
    )(x_flat, scale_l, bias_l, jnp.asarray(l2g), jnp.asarray(g2l))


def _pick_tile_h(h: int, wc: int) -> int:
    """Largest row-tile divisor of h keeping (tile_h, wc) f32 temps <= 2MB
    (tile_h=128 at the model's universal wc=4096 — measured fastest; 256
    blows scoped VMEM)."""
    budget = max(1, (2 * 1024 * 1024) // (wc * 4))
    t = min(h, budget)
    while t > 1 and h % t != 0:
        t -= 1
    return t


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


def _conv_gn_silu_batched_kernel(x_ref, w_ref, scale_ref, bias_ref,
                                 gmask_ref, o_ref, xpad_ref, *, eps: float,
                                 denom: float, conv_precision, images: int):
    """K images per grid step: same fused [3x3 conv -> GN -> SiLU] body as
    the per-image kernel, looped over the block's image axis — fewer,
    fatter grid steps give the DMA pipeline K-image chunks to overlap
    with compute (the round-1 per-image grid starved it)."""
    h, w, cin = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cout = o_ref.shape[3]

    def body(k, _):
        xpad_ref[...] = jnp.zeros_like(xpad_ref)
        xpad_ref[1 : h + 1, 1 : w + 1, :] = x_ref[k]

        acc = jnp.zeros((h, w, cout), jnp.float32)
        for t in range(9):
            dy, dx = t // 3, t % 3
            patch = xpad_ref[dy : dy + h, dx : dx + w, :]
            acc += lax.dot_general(
                patch, w_ref[t],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=conv_precision,
            )

        gmask = gmask_ref[...]
        sum_c = _sum_hw(acc)
        mean_c = jnp.dot(sum_c, gmask, preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST) / denom
        d = acc - mean_c
        var_c = jnp.dot(_sum_hw(d * d), gmask,
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST) / denom
        rstd_c = lax.rsqrt(var_c + eps)
        y = d * (rstd_c * scale_ref[...].astype(jnp.float32))
        y = y + bias_ref[...].astype(jnp.float32)
        y = y * jax.nn.sigmoid(y)
        o_ref[k] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, images, body, 0)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "images",
                                             "interpret"))
def _fused_conv_gn_silu_batched(x, w, scale, bias, *, num_groups: int,
                                eps: float, images: int,
                                interpret: bool = False):
    """x: (N, H, W, Cin) with N % images == 0; w: (3, 3, Cin, Cout) HWIO."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    w9 = w.astype(x.dtype).reshape(9, cin, cout)
    denom = float(h * wd * (cout // num_groups))
    conv_precision = (
        lax.Precision.HIGHEST if x.dtype == jnp.float32 else lax.Precision.DEFAULT
    )
    kernel = functools.partial(_conv_gn_silu_batched_kernel, eps=eps,
                               denom=denom, conv_precision=conv_precision,
                               images=images)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
        grid=(n // images,),
        in_specs=[
            pl.BlockSpec((images, h, wd, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((images, h, wd, cout), lambda i: (i, 0, 0, 0),
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
                          use_pallas: bool | None = None,
                          images_per_step: int | None = None) -> jax.Array:
    """Conv3x3(same, no bias) -> GroupNorm -> SiLU, fully fused on TPU.

    Auto-dispatch targets the U-Net's high-channel levels (the MXU-friendly
    regime: C >= 64 lanes, small spatial slabs that sit in VMEM); elsewhere
    it falls back to the XLA composition in ops.conv_blocks.

    ``images_per_step=K`` routes to the batched-grid variant (K images per
    grid step; requires batch % K == 0). Measured SLOWER than the per-image
    grid on v5e (docs/PERF.md §7 — Mosaic pipelines grid steps better than
    an in-kernel image loop); kept as validated infrastructure for shapes
    where fatter DMA chunks could win.
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
    if cout % num_groups != 0:
        # the auto path checks this; a forced use_pallas=True must not
        # silently compute ragged pseudo-group statistics
        raise ValueError(
            f"fused conv+GN+SiLU needs cout % num_groups == 0 "
            f"(got cout={cout}, num_groups={num_groups})")
    interpret = jax.default_backend() != "tpu"
    if images_per_step is not None and images_per_step > 1:
        if n % images_per_step != 0:
            raise ValueError(
                f"batch {n} not divisible by images_per_step {images_per_step}")
        return _fused_conv_gn_silu_batched(
            x, w, scale, bias, num_groups=num_groups, eps=eps,
            images=images_per_step, interpret=interpret)
    return _fused_conv_gn_silu_pallas(x, w, scale, bias, num_groups=num_groups,
                                      eps=eps, interpret=interpret)
