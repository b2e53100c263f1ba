"""int8 activation quantization for the HBM-bound serving forward.

The LightweightUNet serving step is bandwidth-bound: XLA fuses each
conv+GN+SiLU chain into one kernel, so device time is dominated by reading
and writing the *materialized* inter-fusion activations (~140 MB/image at
bf16, docs/PERF.md). Weight-only int8 measured throughput-neutral — a
486K-param model's weight traffic is noise — so the remaining lever is the
activations themselves.

``fake_quant_act_int8`` stores an activation as int8 in HBM (per-channel
symmetric scales, AQT-style): the producer fusion gains a round/clip/cast
epilogue, the consumer a widen-multiply prologue, and the buffer between
them shrinks 2x vs bf16 (4x vs f32). An ``optimization_barrier`` on the
int8 tensor pins the materialization point so XLA cannot "helpfully" fuse
producer into consumer and keep a wide intermediate.

Scales are CALIBRATED offline (max-|x| per channel over sample images, the
standard static-PTQ recipe — dynamic scales would need a full extra read
of the tensor before writing it, paying back the traffic they save).
GroupNorm sits immediately before every quantization site, so activation
ranges are input-independent enough for static scales to hold.

The reference has no activation-quantization counterpart; its fbgemm
static PTQ (reference: src/model.py:399-439) quantizes weights and relies
on CPU int8 kernels. Capability here goes beyond it: the quantized model
runs on the TPU serving path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def fake_quant_act_int8(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Round-trip ``x`` through an int8 HBM buffer with per-channel scales.

    Args:
        x: (..., C) activation in any floating dtype.
        scale: (C,) float32 per-channel scales (max|x| / 127 from
            calibration).

    Returns:
        The dequantized activation in ``x.dtype``. Between the producer and
        consumer fusions the tensor lives in HBM as int8.
    """
    s = jnp.maximum(scale.astype(jnp.float32), 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127.0, 127.0)
    q = q.astype(jnp.int8)
    # pin the int8 buffer as the fusion seam: without this XLA may fuse
    # straight through and materialize the wide dtype instead
    q = lax.optimization_barrier(q)
    return (q.astype(jnp.float32) * s).astype(x.dtype)


def scales_from_act_stats(stats, *, margin: float = 1.0):
    """Turn a sown ``act_stats`` collection (per-site per-channel max|x|,
    each leaf a tuple of one array per apply) into the scales pytree
    ``LightweightUNet(..., act_scales=...)`` consumes.

    ``margin`` > 1 leaves clip headroom for inputs hotter than the
    calibration set.
    """
    import numpy as np

    def to_scale(leaf):
        if isinstance(leaf, tuple):
            leaf = jnp.max(jnp.stack(leaf), axis=0)
        m = np.asarray(leaf, dtype=np.float32)
        return np.maximum(m * margin, 1e-8) / 127.0

    return jax.tree_util.tree_map(
        to_scale, stats, is_leaf=lambda t: isinstance(t, tuple))


#: Quantization-site groups by feature-map area for LightweightUNet at
#: 512^2 input: "hot" sites carry ~97% of inter-fusion activation traffic
#: (the 512^2 / 256^2 / 128^2 levels); the rest are noise-adders with
#: negligible bandwidth payback.
HOT_SITES_512 = (
    "enc1", "p1", "enc2", "p2", "enc3",          # encoder top 3 levels
    "u3", "dec3", "u2", "dec2", "u1", "dec1",    # decoder top 3 levels
)


def subset_act_scales(scales: dict, keep=HOT_SITES_512) -> dict:
    """Keep only the named top-level sites (missing sites run unquantized).

    Fewer sites = less accumulated quantization noise; keeping just the
    high-traffic levels retains nearly all the bandwidth win.
    """
    keep = set(keep)
    return {k: v for k, v in scales.items() if k in keep}


def merge_act_stats(a, b):
    """Elementwise max of two act_stats / scales pytrees (multi-batch
    calibration)."""
    if a is None:
        return b
    return jax.tree_util.tree_map(jnp.maximum, a, b)
