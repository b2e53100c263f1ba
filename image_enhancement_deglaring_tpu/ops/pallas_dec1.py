"""Whole-slice Mosaic kernel: [dec1 dual conv block + output conv] fused.

The round-2 close-out (docs/PERF.md §Pallas) showed op-level fusion cannot
beat XLA's conv+epilogue pipeline; the remaining single-chip headroom
(~1.24x activation traffic over hand-count) is only reachable below op
granularity. This is the ONE bounded whole-network-slice attempt round 3
owes: the 512^2 decoder tail — the widest activation traffic in the
model — as a single kernel with VMEM-RESIDENT intermediates:

    h1  = conv3x3(x_up, Wa) + conv3x3(x_skip, Wb)      (C=8 @ 512^2)
    a1  = silu(group_norm(h1))                          8 groups of 1 ch
    h2  = conv3x3(a1, W2)
    a2  = silu(group_norm(h2))
    out = conv1x1(a2, Wout) + bout

XLA materializes h1 and h2 to HBM (plus GN reduction traffic); this
kernel holds both in VMEM scratch across a 3-phase grid, so HBM traffic
is exactly: read x_up + x_skip once, write out once.

LAYOUT: channels-on-sublanes (B, C, H, W). At C=8 the model's native
NHWC layout is unusable in VMEM — an (..., W, 8) tile pads its 8-lane
minor dim to 128 (16x memory, 67 MB for one resident 512^2 slab), and
the flat (H, W*C) trick that saved the GN kernels cannot express the
conv's cross-channel contraction without minor-dim reshapes Mosaic
rejects. With (C, H, W) the minor dims are (H, W): clean (8, 128)
tiling, 4 MB per resident slab, and the 3x3 conv becomes 9 shifted
dot_generals contracting the leading channel axis. The price is NCHW
inputs: the caller must transpose (measured separately in the harness —
that transpose traffic is part of the honest close-out).

Per-image phases (grid = (B, 3, T) over row tiles; Pallas TPU grids run
sequentially, so scratch carries state between steps):
  p0: DMA input row tiles from HBM (body + conditional 1-row halos),
      conv1 -> h1 scratch, accumulate GN1 per-channel sums;
  p1: GN1 affine from the accumulators; a1 tiles recomputed from the
      resident h1 (halo rows read straight from scratch), conv2 -> h2
      scratch, accumulate GN2 sums;
  p2: GN2 affine; out tile = dot(wout, a2) + bout, written FLAT
      (B, H, W) f32 — a trailing dim of 1 would tile-pad the store.

Reference counterpart of the computation: the last decoder block + final
1x1 conv of src/model.py:101-133.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv9_cfirst(pad_ref, w_ref, c, th, w, precision):
    """3x3 same conv over a padded (C, th+2, w+2) slab: 9 shifted-view
    dot_generals contracting the channel axis, f32 accumulator (Cout, th, w)."""
    acc = jnp.zeros((c, th, w), jnp.float32)
    for k in range(9):
        dy, dx = k // 3, k % 3
        patch = pad_ref[:, dy : dy + th, dx : dx + w]  # (Cin, th, w)
        # w_ref[k]: (Cin, Cout); contract Cin -> (Cout, th, w)
        acc += lax.dot_general(
            w_ref[k], patch,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    return acc


def _bcast_c(v, c, th, w):
    """(C, 1) per-channel vector -> (C, th, w)."""
    return lax.broadcast_in_dim(v, (c, th, w), (0, 1))


def _affine_silu_cfirst(x, acc_ref, scale_ref, bias_ref, denom, eps, dtype,
                        th, w):
    """x: (C, th, w); per-channel GN affine from the (C, 2) sum/sumsq
    accumulator, then SiLU."""
    c = x.shape[0]
    mean = acc_ref[:, 0:1] / denom                     # (C, 1)
    var = acc_ref[:, 1:2] / denom - mean * mean
    a = lax.rsqrt(var + eps) * scale_ref[...]
    b = bias_ref[...] - mean * a
    y = x.astype(jnp.float32) * _bcast_c(a, c, th, w) + _bcast_c(b, c, th, w)
    return (y * jax.nn.sigmoid(y)).astype(dtype)


def _dec1_out_kernel(xup_ref, xsk_ref, wa_ref, wb_ref, w2_ref,
                     g1s_ref, g1b_ref, g2s_ref, g2b_ref, wo_ref, bo_ref,
                     o_ref,
                     h1_ref, h2_ref, pad_a_ref, pad_b_ref,
                     body_a_ref, body_b_ref, aux_a_ref, aux_b_ref,
                     aux_a2_ref, aux_b2_ref,
                     acc1_ref, acc2_ref, sem,
                     *, tile_h: int, n_tiles: int, width: int, cin: int,
                     eps: float, denom: float, precision):
    b = pl.program_id(0)
    p = pl.program_id(1)
    t = pl.program_id(2)
    th, w, c = tile_h, width, cin
    r0 = t * th
    dtype = h1_ref.dtype

    @pl.when((p == 0) & (t == 0))
    def _reset():
        acc1_ref[...] = jnp.zeros_like(acc1_ref)
        acc2_ref[...] = jnp.zeros_like(acc2_ref)

    # ---------------------------------------------------------- phase 0
    @pl.when(p == 0)
    def _conv1():
        # DMA destinations must be TILE-ALIGNED vmem slices, so land the
        # body and the 8-row halo chunks in aligned scratches, then
        # vector-copy into the padded slab at STATIC (unaligned-ok) offsets
        def body_copy(src_ref, dst_ref, s):
            return pltpu.make_async_copy(
                src_ref.at[b, :, pl.ds(r0, th)], dst_ref, sem.at[s])

        def chunk_copy(src_ref, dst_ref, src_row, s):
            return pltpu.make_async_copy(
                src_ref.at[b, :, pl.ds(pl.multiple_of(src_row, 8), 8)],
                dst_ref, sem.at[s])

        body_copy(xup_ref, body_a_ref, 0).start()
        body_copy(xsk_ref, body_b_ref, 1).start()

        @pl.when(t > 0)
        def _halo_top():
            chunk_copy(xup_ref, aux_a_ref, r0 - 8, 2).start()
            chunk_copy(xsk_ref, aux_b_ref, r0 - 8, 3).start()

        @pl.when(t < n_tiles - 1)
        def _halo_bot():
            chunk_copy(xup_ref, aux_a2_ref, r0 + th, 4).start()
            chunk_copy(xsk_ref, aux_b2_ref, r0 + th, 5).start()

        # zero the column borders while the DMAs fly
        zc = jnp.zeros((c, th + 2, 1), dtype)
        for ref in (pad_a_ref, pad_b_ref):
            ref[:, :, 0:1] = zc
            ref[:, :, w + 1 :] = zc

        body_copy(xup_ref, body_a_ref, 0).wait()
        body_copy(xsk_ref, body_b_ref, 1).wait()
        pad_a_ref[:, 1 : th + 1, 1 : w + 1] = body_a_ref[...]
        pad_b_ref[:, 1 : th + 1, 1 : w + 1] = body_b_ref[...]

        zr1 = jnp.zeros((c, 1, w), dtype)

        @pl.when(t == 0)
        def _zero_top():
            pad_a_ref[:, 0:1, 1 : w + 1] = zr1
            pad_b_ref[:, 0:1, 1 : w + 1] = zr1

        @pl.when(t == n_tiles - 1)
        def _zero_bot():
            pad_a_ref[:, th + 1 :, 1 : w + 1] = zr1
            pad_b_ref[:, th + 1 :, 1 : w + 1] = zr1

        @pl.when(t > 0)
        def _wait_top():
            chunk_copy(xup_ref, aux_a_ref, r0 - 8, 2).wait()
            chunk_copy(xsk_ref, aux_b_ref, r0 - 8, 3).wait()
            pad_a_ref[:, 0:1, 1 : w + 1] = aux_a_ref[:, 7:8, :]
            pad_b_ref[:, 0:1, 1 : w + 1] = aux_b_ref[:, 7:8, :]

        @pl.when(t < n_tiles - 1)
        def _wait_bot():
            chunk_copy(xup_ref, aux_a2_ref, r0 + th, 4).wait()
            chunk_copy(xsk_ref, aux_b2_ref, r0 + th, 5).wait()
            pad_a_ref[:, th + 1 :, 1 : w + 1] = aux_a2_ref[:, 0:1, :]
            pad_b_ref[:, th + 1 :, 1 : w + 1] = aux_b2_ref[:, 0:1, :]

        acc = _conv9_cfirst(pad_a_ref, wa_ref, c, th, w, precision)
        acc += _conv9_cfirst(pad_b_ref, wb_ref, c, th, w, precision)
        h1_ref[:, pl.ds(r0, th)] = acc.astype(dtype)
        acc1_ref[:, 0:1] += jnp.sum(jnp.sum(acc, axis=2), axis=1,
                                    keepdims=True)
        acc1_ref[:, 1:2] += jnp.sum(jnp.sum(acc * acc, axis=2), axis=1,
                                    keepdims=True)

    # ---------------------------------------------------------- phase 1
    @pl.when(p == 1)
    def _conv2():
        aff = functools.partial(_affine_silu_cfirst, acc_ref=acc1_ref,
                                scale_ref=g1s_ref, bias_ref=g1b_ref,
                                denom=denom, eps=eps, dtype=dtype, w=w)
        pad_a_ref[:, pl.ds(1, th), pl.ds(1, w)] = aff(
            h1_ref[:, pl.ds(r0, th)], th=th)
        zc = jnp.zeros((c, th + 2, 1), dtype)
        pad_a_ref[:, :, 0:1] = zc
        pad_a_ref[:, :, w + 1 :] = zc
        zr1 = jnp.zeros((c, 1, w), dtype)

        @pl.when(t == 0)
        def _top0():
            pad_a_ref[:, pl.ds(0, 1), pl.ds(1, w)] = zr1

        # halo rows: Mosaic requires DYNAMIC sublane indices to be provably
        # 8-aligned (static unaligned offsets are fine) — so load an
        # aligned 8-row chunk and value-slice the single row wanted
        @pl.when(t > 0)
        def _top():
            # pl.multiple_of: Mosaic's affine prover handles c*t but not
            # c*t - 8; assert the alignment it cannot derive
            chunk = h1_ref[:, pl.ds(pl.multiple_of(r0 - 8, 8), 8)]
            pad_a_ref[:, pl.ds(0, 1), pl.ds(1, w)] = aff(
                chunk[:, 7:8, :], th=1)

        @pl.when(t == n_tiles - 1)
        def _bot0():
            pad_a_ref[:, pl.ds(th + 1, 1), pl.ds(1, w)] = zr1

        @pl.when(t < n_tiles - 1)
        def _bot():
            chunk = h1_ref[:, pl.ds(pl.multiple_of(r0 + th, 8), 8)]
            pad_a_ref[:, pl.ds(th + 1, 1), pl.ds(1, w)] = aff(
                chunk[:, 0:1, :], th=1)

        acc = _conv9_cfirst(pad_a_ref, w2_ref, c, th, w, precision)
        h2_ref[:, pl.ds(r0, th)] = acc.astype(dtype)
        acc2_ref[:, 0:1] += jnp.sum(jnp.sum(acc, axis=2), axis=1,
                                    keepdims=True)
        acc2_ref[:, 1:2] += jnp.sum(jnp.sum(acc * acc, axis=2), axis=1,
                                    keepdims=True)

    # ---------------------------------------------------------- phase 2
    @pl.when(p == 2)
    def _out():
        a2 = _affine_silu_cfirst(
            h2_ref[:, pl.ds(r0, th)], acc_ref=acc2_ref, scale_ref=g2s_ref,
            bias_ref=g2b_ref, denom=denom, eps=eps, dtype=jnp.float32,
            th=th, w=w)
        # 1x1 conv to one channel: contract the channel axis
        out = lax.dot_general(
            wo_ref[...], a2,                   # (1, C) x (C, th, w)
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )                                      # (1, th, w)
        o_ref[0] = (out[0] + bo_ref[0, 0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "tile_h",
                                             "interpret"))
def fused_dec1_output(x_up, x_skip, wa, wb, w2, g1_scale, g1_bias,
                      g2_scale, g2_bias, w_out, b_out, *,
                      num_groups: int = 8, eps: float = 1e-5,
                      tile_h: int = 64, interpret: bool = False):
    """Fused [dual conv block + GN/SiLU x2 + 1x1 output conv].

    Args:
      x_up, x_skip: (B, C, H, W) — CHANNELS-FIRST (see module docstring);
          C must equal num_groups (per-channel statistics).
      wa, wb: (3, 3, C, C) HWIO conv1 halves (dual-conv split of the
          (3,3,2C,C) concat kernel); w2: (3, 3, C, C).
      w_out: (1, 1, C, 1) HWIO; b_out: (1,).
    Returns (B, H, W) float32 (flat — append [..., None] for NHWC),
    matching the XLA composition within bf16 tolerance.
    """
    n, c, h, w = x_up.shape
    if c != num_groups:
        # hard contract, not a debug check: under python -O an assert would
        # strip and the kernel would silently compute per-channel statistics
        # where grouped ones were requested
        raise ValueError(
            f"fused_dec1_output assumes per-channel GN: C={c} must equal "
            f"num_groups={num_groups} (use dec1_output_xla otherwise)")
    # multi-tile mode needs tile_h % 8 == 0: the halo loads/DMAs promise
    # Mosaic 8-aligned dynamic offsets via pl.multiple_of — a false promise
    # silently reads the wrong halo rows on hardware (interpret mode can't
    # catch it: pl.multiple_of is a no-op there). Fall back to one tile.
    if h % tile_h != 0 or (tile_h % 8 != 0 and tile_h != h):
        tile_h = h
    n_tiles = h // tile_h
    denom = float(h * w)
    dtype = x_up.dtype
    precision = (lax.Precision.HIGHEST if dtype == jnp.float32
                 else lax.Precision.DEFAULT)

    kernel = functools.partial(
        _dec1_out_kernel, tile_h=tile_h, n_tiles=n_tiles, width=w, cin=c,
        eps=eps, denom=denom, precision=precision)

    col = lambda v: jnp.asarray(v, jnp.float32).reshape(c, 1)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        grid=(n, 3, n_tiles),
        in_specs=[
            # inputs stay in HBM; the kernel DMAs halo'd row tiles itself
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9, c, c), lambda i, p, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, c), lambda i, p, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, c), lambda i, p, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i, p, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i, p, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i, p, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i, p, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, p, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, p, t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        # phases 0/1 alias tile 0's slot; phase 2 rewrites it at t=0 before
        # it is ever flushed (the p*t phantom-store trick, 3-phase form)
        out_specs=pl.BlockSpec((1, tile_h, w),
                               lambda i, p, t: (i, (p // 2) * t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c, h, w), dtype),                  # h1 (resident)
            pltpu.VMEM((c, h, w), dtype),                  # h2 (resident)
            pltpu.VMEM((c, tile_h + 2, w + 2), dtype),     # padded tile A
            pltpu.VMEM((c, tile_h + 2, w + 2), dtype),     # padded tile B
            pltpu.VMEM((c, tile_h, w), dtype),             # DMA body A
            pltpu.VMEM((c, tile_h, w), dtype),             # DMA body B
            pltpu.VMEM((c, 8, w), dtype),                  # top halo chunk A
            pltpu.VMEM((c, 8, w), dtype),                  # top halo chunk B
            pltpu.VMEM((c, 8, w), dtype),                  # bottom halo A
            pltpu.VMEM((c, 8, w), dtype),                  # bottom halo B
            pltpu.VMEM((c, 2), jnp.float32),               # GN1 sum/sumsq
            pltpu.VMEM((c, 2), jnp.float32),               # GN2 sum/sumsq
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
    )(x_up, x_skip,
      wa.astype(dtype).reshape(9, c, c), wb.astype(dtype).reshape(9, c, c),
      w2.astype(dtype).reshape(9, c, c),
      col(g1_scale), col(g1_bias), col(g2_scale), col(g2_bias),
      jnp.asarray(w_out, jnp.float32).reshape(1, c),
      jnp.asarray(b_out, jnp.float32).reshape(1, 1))


def dec1_output_xla(x_up, x_skip, wa, wb, w2, g1_scale, g1_bias,
                    g2_scale, g2_bias, w_out, b_out, *, num_groups: int = 8,
                    eps: float = 1e-5):
    """The same slice as XLA ops over NHWC inputs (the production path),
    for A/B correctness and timing."""
    from .conv_blocks import conv2d, group_norm, silu

    h1 = conv2d(x_up, wa, padding=1) + conv2d(x_skip, wb, padding=1)
    a1 = silu(group_norm(h1, g1_scale, g1_bias, num_groups=num_groups,
                         eps=eps))
    h2 = conv2d(a1, w2, padding=1)
    a2 = silu(group_norm(h2, g2_scale, g2_bias, num_groups=num_groups,
                         eps=eps))
    return conv2d(a2, jnp.asarray(w_out), jnp.asarray(b_out)).astype(
        jnp.float32)
