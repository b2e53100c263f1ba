"""Model utilities: parameter counting, size, pruning, int8 quantization.

Capability parity with the reference's model helpers
(reference: src/model.py:364-486 — count_parameters, get_model_size_mb,
quantize_model via fbgemm PTQ, prune_model via L1-unstructured pruning).
On TPU the quantization analogue is symmetric per-tensor int8 with a scale,
and pruning is magnitude masking on the weight pytrees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def count_parameters(params) -> int:
    """Total number of parameters in a pytree (reference: src/model.py:364)."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def get_model_size_mb(params) -> float:
    """Parameter bytes in MB (reference: src/model.py:377)."""
    # metadata only — jnp.asarray here would device-transfer every host
    # leaf just to read its itemsize
    total = sum(
        int(np.prod(x.shape)) * np.dtype(x.dtype).itemsize
        for x in jax.tree_util.tree_leaves(params)
    )
    return total / (1024 * 1024)


def prune_params(params, amount: float = 0.3):
    """Global-per-tensor L1-unstructured pruning: zero out the lowest-magnitude
    fraction of each weight tensor (reference: src/model.py:442-482).

    Only prunes rank>=2 tensors (conv/linear kernels), leaving norm scales
    and biases intact, matching the reference's Conv2d/Linear-only rule.
    """

    def prune_leaf(x):
        x = jnp.asarray(x)
        if x.ndim < 2:
            return x
        k = int(round(amount * x.size))
        if k <= 0:
            return x
        # zero EXACTLY the k smallest magnitudes (torch's l1_unstructured
        # removes exactly k via topk) — a <=threshold test would also zero
        # every tie at the k-th magnitude, e.g. after int8 dequantization
        # puts many weights on the same grid point
        flat = jnp.abs(x).reshape(-1)
        keep = jnp.ones(flat.shape, jnp.bool_).at[
            jnp.argsort(flat)[:k]].set(False)
        return jnp.where(keep.reshape(x.shape), x, jnp.zeros_like(x))

    return jax.tree_util.tree_map(prune_leaf, params)


def quantize_params_int8(params, *, per_channel: bool = False):
    """Symmetric int8 quantization of rank>=2 weights.

    ``per_channel=False``: one scale per tensor (matches the reference's
    fbgemm per-tensor static PTQ, reference: src/model.py:399-439).
    ``per_channel=True``: one scale per output channel (last axis of HWIO /
    dense kernels) — the AQT-style choice; much tighter error on conv
    kernels whose channels differ in magnitude, at 4 bytes/channel extra.

    Returns (quantized_pytree, scales_pytree); dequantize with
    :func:`dequantize_params_int8`.
    """

    def quant_leaf(path, x):
        x = jnp.asarray(x)
        if x.ndim < 2:
            return x, jnp.asarray(1.0, jnp.float32)
        xf = x.astype(jnp.float32)
        if per_channel:
            # output-channel axis: last for HWIO conv / (in, out) dense
            # kernels, but axis 1 for ConvTranspose weights stored in the
            # torch (Cin, Cout, kh, kw) layout. Those are exactly the
            # params NAMED "weight" under upconv modules (UpConv2x in
            # models/unet.py + enhanced_unet.py); OptimizedUNet's upconvN
            # blocks hold ordinary HWIO kernels named "conv", which must
            # keep the last axis — keying on the module name alone pooled
            # their output channels into kernel-width-indexed scales
            keys = [str(getattr(k, "key", k)) for k in path]
            path_str = "/".join(keys)
            ch_axis = (1 if ("upconv" in path_str and x.ndim == 4
                             and keys[-1] == "weight")
                       else x.ndim - 1)
            axes = tuple(a for a in range(x.ndim) if a != ch_axis)
            amax = jnp.max(jnp.abs(xf), axis=axes, keepdims=True)
        else:
            amax = jnp.max(jnp.abs(xf))
        scale = jnp.maximum(amax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    pairs = [quant_leaf(path, x) for path, x in flat]
    qparams = jax.tree_util.tree_unflatten(treedef, [p[0] for p in pairs])
    scales = jax.tree_util.tree_unflatten(treedef, [p[1] for p in pairs])
    return qparams, scales


def calibrate_act_scales(model, params, sample_batches, *, margin: float = 1.05):
    """Static-PTQ calibration for int8-ACTIVATION serving (see ops.quant).

    Runs ``model`` (a LightweightUNet) over ``sample_batches`` (iterable of
    NHWC float arrays in [0,1]) in ``act_scales="calib"`` mode, collecting
    per-site per-channel max|activation| via the ``act_stats`` collection,
    and returns the scales pytree that ``model.apply(..., act_scales=...)``
    consumes. ``margin`` leaves clip headroom above the calibration max.
    """
    from ..ops.quant import merge_act_stats, scales_from_act_stats

    def unwrap(t):  # sow wraps each site's value in a 1-tuple
        return t[0] if isinstance(t, tuple) else t

    stats = None
    for x in sample_batches:
        _, v = model.apply({"params": params}, jnp.asarray(x),
                           act_scales="calib", mutable=["act_stats"])
        batch = jax.tree_util.tree_map(
            unwrap, v["act_stats"], is_leaf=lambda t: isinstance(t, tuple))
        stats = merge_act_stats(stats, batch)
    if stats is None:
        raise ValueError("calibration needs at least one sample batch")
    return scales_from_act_stats(stats, margin=margin)


def dequantize_params_int8(qparams, scales, dtype=jnp.float32):
    """Inverse of :func:`quantize_params_int8` (per-tensor or per-channel
    scales broadcast identically). jit-safe: used inside the serving
    engine's compiled step so int8 weights live in HBM and widen to the
    compute dtype on the fly."""

    def deq(q, s):
        q = jnp.asarray(q)
        if q.dtype == jnp.int8:
            return (q.astype(jnp.float32) * s).astype(dtype)
        return q.astype(dtype) if q.ndim >= 2 else q

    return jax.tree_util.tree_map(deq, qparams, scales)
