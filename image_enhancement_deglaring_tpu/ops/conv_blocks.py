"""Convolution / normalization building blocks, NHWC, TPU-first.

Numerical semantics match the reference U-Net building blocks
(reference: src/model.py:59-99 — Conv3x3(no bias) -> GroupNorm -> SiLU x2,
AvgPool2d(2,2) downsampling, ConvTranspose2d(k=2,s=2) upsampling), but the
implementation is idiomatic XLA:

- convs run through ``lax.conv_general_dilated`` with NHWC/HWIO dimension
  numbers so XLA tiles them onto the MXU;
- the k=2/s=2 transposed conv is algebraically a per-pixel matmul followed
  by a depth-to-space rearrangement — we implement exactly that (one MXU
  matmul + reshape) instead of a strided transposed convolution, which is
  both faster and simpler for XLA to fuse;
- GroupNorm is a straight reduction in NHWC grouped layout (eps matches
  torch's 1e-5 default).

All ops take/return float arrays of any floating dtype; reductions for
normalization are accumulated in float32 regardless of input dtype.

Contractions are issued with ``Precision.HIGHEST``: for float32 operands
this stops XLA from silently dropping to bfloat16 passes (observed on both
TPU and oneDNN CPU backends); for bfloat16 operands — the TPU fast path —
it is a no-op, so speed comes from choosing the compute dtype, not from
loosening precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def resolve_group_count(features: int, num_groups: int) -> int:
    """Largest divisor of ``features`` that is <= ``num_groups``.

    Mirrors the group-count rule of the reference block builder
    (reference: src/model.py:71-86): if ``num_groups`` does not divide
    ``features``, fall back to the largest divisor that does.
    """
    g = min(num_groups, features)
    while g > 1 and features % g != 0:
        g -= 1
    return max(g, 1)


def silu(x: jax.Array) -> jax.Array:
    """SiLU / swish: x * sigmoid(x)."""
    return x * jax.nn.sigmoid(x)


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
) -> jax.Array:
    """2-D convolution, NHWC activations x HWIO weights.

    Args:
        x: (N, H, W, Cin)
        w: (kh, kw, Cin, Cout)
        b: optional (Cout,) bias
    """
    if w.shape[0] == 1 and w.shape[1] == 1 and stride == 1 and padding == 0:
        # 1x1 conv as a plain channel matmul: maps straight onto the MXU and
        # sidesteps a jax vmap-batching defect for 1-output-channel convs.
        y = jnp.einsum(
            "nhwc,co->nhwo",
            x,
            w[0, 0].astype(x.dtype),
            precision=lax.Precision.HIGHEST,
        )
        if b is not None:
            y = y + b.astype(y.dtype)
        return y
    pad = ((padding, padding), (padding, padding))
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    num_groups: int,
    eps: float = 1e-5,
) -> jax.Array:
    """GroupNorm over NHWC input; normalizes per (batch, group) across
    (H, W, channels-in-group), biased variance, matching torch.nn.GroupNorm.

    Args:
        x: (N, H, W, C)
        scale, bias: (C,)
    """
    n, h, w, c = x.shape
    cg = c // num_groups
    xf = x.astype(jnp.float32).reshape(n, h, w, num_groups, cg)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y.reshape(n, h, w, c)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def conv_block(
    x: jax.Array,
    params: dict,
    *,
    num_groups: int,
    eps: float = 1e-5,
) -> jax.Array:
    """[Conv3x3(no bias) -> GroupNorm -> SiLU] x 2.

    ``params`` keys: conv1/gn1_scale/gn1_bias/conv2/gn2_scale/gn2_bias.
    Matches the reference `_block` (reference: src/model.py:92-99).
    """
    y = conv2d(x, params["conv1"], padding=1)
    y = group_norm(y, params["gn1_scale"], params["gn1_bias"], num_groups=num_groups, eps=eps)
    y = silu(y)
    y = conv2d(y, params["conv2"], padding=1)
    y = group_norm(y, params["gn2_scale"], params["gn2_bias"], num_groups=num_groups, eps=eps)
    y = silu(y)
    return y


def conv_block_dual(
    x_up: jax.Array,
    x_skip: jax.Array,
    params: dict,
    *,
    num_groups: int,
    eps: float = 1e-5,
    pallas_gn: bool = False,
    act_hook=None,
) -> jax.Array:
    """Decoder block: conv_block(concat([x_up, x_skip]), ...) computed
    WITHOUT materializing the concatenation.

    conv1's kernel (3,3,2f,f) splits along its input-channel axis into the
    up-path and skip-path halves; conv(concat(a,b), w) == conv(a, w_a) +
    conv(b, w_b) exactly. Skipping the concat avoids writing (and
    re-reading) a doubled-width activation to HBM at every decoder level —
    the widest tensors in the network (channel order matches the reference
    torch.cat((dec, enc), dim=1), reference: src/model.py:116).
    """
    if pallas_gn:
        from .pallas_kernels import fused_group_norm_silu as _gns

        def gn_silu(y, s, b):
            return _gns(y, s, b, num_groups=num_groups, eps=eps)
    else:
        def gn_silu(y, s, b):
            return silu(group_norm(y, s, b, num_groups=num_groups, eps=eps))

    f = x_up.shape[-1]
    w1 = params["conv1"]
    y = conv2d(x_up, w1[:, :, :f, :], padding=1) + conv2d(
        x_skip, w1[:, :, f:, :], padding=1
    )
    y = gn_silu(y, params["gn1_scale"], params["gn1_bias"])
    if act_hook is not None:  # int8-activation site (see ops.quant)
        y = act_hook(y, "a1")
    y = conv2d(y, params["conv2"], padding=1)
    y = gn_silu(y, params["gn2_scale"], params["gn2_bias"])
    if act_hook is not None:
        y = act_hook(y, "a2")
    return y


def avg_pool_2x2(x: jax.Array) -> jax.Array:
    """AvgPool2d(kernel=2, stride=2) on NHWC."""
    y = lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        lax.add,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )
    return (y * 0.25).astype(x.dtype)


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """MaxPool2d(kernel=2, stride=2) on NHWC."""
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def upsample2x_matmul(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """ConvTranspose2d(kernel=2, stride=2) as matmul + depth-to-space.

    For kernel==stride==2, every input pixel independently produces a 2x2
    output block: out[n, 2i+di, 2j+dj, co] = sum_ci x[n,i,j,ci] * w[ci,co,di,dj].
    That is one (N*H*W, Cin) @ (Cin, 4*Cout) matmul — ideal for the MXU —
    followed by a reshape/transpose. Numerically identical to torch's
    ConvTranspose2d(Cin, Cout, 2, 2) (reference: src/model.py:47-53).

    Args:
        x: (N, H, W, Cin)
        w: (Cin, Cout, 2, 2)   (torch ConvTranspose2d weight layout)
        b: optional (Cout,)
    """
    n, h, ww, cin = x.shape
    cout = w.shape[1]
    # (Cin, Cout, 2, 2) -> (Cin, 2, 2, Cout) -> (Cin, 4*Cout)
    wmat = jnp.transpose(w, (0, 2, 3, 1)).reshape(cin, 4 * cout).astype(x.dtype)
    y = jnp.dot(
        x.reshape(-1, cin),
        wmat,
        preferred_element_type=x.dtype,
        precision=lax.Precision.HIGHEST,
    )
    # (N, H, W, 2, 2, Cout) -> (N, H, 2, W, 2, Cout) -> (N, 2H, 2W, Cout)
    y = y.reshape(n, h, ww, 2, 2, cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(n, 2 * h, 2 * ww, cout)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x upsample on NHWC (reference: src/optimized_model.py:112)."""
    n, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return y.reshape(n, 2 * h, 2 * w, c)
