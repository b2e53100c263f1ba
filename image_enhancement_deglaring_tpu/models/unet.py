"""LightweightUNet — the production ~486K-parameter de-glaring model.

Architecture parity with the reference (reference: src/model.py:9-133):
4-level encoder/decoder U-Net, [Conv3x3 -> GroupNorm -> SiLU] x2 blocks,
AvgPool 2x2 downsampling, ConvTranspose(k=2,s=2) upsampling, channel-concat
skip connections, 1x1 output conv. features [8,16,32,64,128], GroupNorm
groups resolved by the largest-divisor rule (reference: src/model.py:71-86).

TPU-native differences (behavior-preserving):
- NHWC activations / HWIO conv weights so XLA maps convs onto the MXU;
- the k=2/s=2 transposed conv runs as a matmul + depth-to-space
  (see ops.conv_blocks.upsample2x_matmul) — numerically identical;
- a ``dtype`` field selects the on-device compute precision (bfloat16 for
  the fast path); parameters always live in float32.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.conv_blocks import (
    avg_pool_2x2,
    conv2d,
    conv_block_dual,
    group_norm,
    resolve_group_count,
    silu,
    upsample2x_matmul,
)


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """Torch Conv2d default init (kaiming_uniform, a=sqrt(5)) for HWIO kernels."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_convT_kernel_init(key, shape, dtype=jnp.float32):
    """Torch ConvTranspose2d default init for (Cin, Cout, kh, kw) kernels."""
    fan_in = shape[1] * shape[2] * shape[3]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _uniform_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _act_site(mdl: nn.Module, t: jax.Array, name: str, act_scales):
    """One int8-activation quantization site (see ops.quant).

    ``act_scales`` selects the mode: None = off (exact reference numerics);
    "calib" = sow per-channel max|t| into the ``act_stats`` collection;
    a pytree = store ``t`` as int8 in HBM with ``act_scales[name]`` scales.
    """
    if act_scales is None:
        return t
    if isinstance(act_scales, str):  # "calib"
        mdl.sow("act_stats", name,
                jnp.max(jnp.abs(t.astype(jnp.float32)), axis=(0, 1, 2)))
        return t
    scale = act_scales.get(name)
    if scale is None:  # site excluded (e.g. low-traffic levels)
        return t
    from ..ops.quant import fake_quant_act_int8

    return fake_quant_act_int8(t, scale)


def _sub_scales(act_scales, name: str):
    """Slice a child module's entry out of the scales pytree (pass-through
    for the None / "calib" modes; missing key = child runs unquantized)."""
    if act_scales is None or isinstance(act_scales, str):
        return act_scales
    return act_scales.get(name)


class ConvBlock(nn.Module):
    """[Conv3x3(no bias) -> GroupNorm -> SiLU] x 2 (reference: src/model.py:92-99).

    ``fused=True`` routes each conv+GN+SiLU through the Pallas fused kernel
    (ops.pallas_kernels.fused_conv3x3_gn_silu), which auto-falls back to
    the XLA composition off-TPU or when a slab doesn't fit VMEM.
    """

    features: int
    num_groups: int = 8
    fused: bool = False
    #: fuse each GroupNorm+SiLU pair into one Pallas kernel (one HBM read +
    #: one write, vs XLA's two reads + one write); convs stay on XLA
    pallas_gn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, act_scales=None) -> jax.Array:
        f = self.features
        g = resolve_group_count(f, self.num_groups)
        cin = x.shape[-1]
        w1 = self.param("conv1", torch_conv_kernel_init, (3, 3, cin, f))
        s1 = self.param("gn1_scale", nn.initializers.ones, (f,))
        b1 = self.param("gn1_bias", nn.initializers.zeros, (f,))
        w2 = self.param("conv2", torch_conv_kernel_init, (3, 3, f, f))
        s2 = self.param("gn2_scale", nn.initializers.ones, (f,))
        b2 = self.param("gn2_bias", nn.initializers.zeros, (f,))

        if self.fused:
            from ..ops.pallas_kernels import fused_conv3x3_gn_silu

            y = fused_conv3x3_gn_silu(x, w1, s1, b1, num_groups=g)
            y = _act_site(self, y, "a1", act_scales)
            y = fused_conv3x3_gn_silu(y, w2, s2, b2, num_groups=g)
            return _act_site(self, y, "a2", act_scales)

        if self.pallas_gn:
            from ..ops.pallas_kernels import fused_group_norm_silu as _gns

            def gn_silu(y, s, b):
                return _gns(y, s, b, num_groups=g)
        else:
            def gn_silu(y, s, b):
                return silu(group_norm(y, s, b, num_groups=g))

        y = conv2d(x, w1, padding=1)
        y = _act_site(self, gn_silu(y, s1, b1), "a1", act_scales)
        y = conv2d(y, w2, padding=1)
        return _act_site(self, gn_silu(y, s2, b2), "a2", act_scales)


class DualConvBlock(nn.Module):
    """Decoder ConvBlock fed by (upsampled, skip) pairs without a concat.

    Parameter names/shapes are identical to ConvBlock over the
    concatenated input (conv1: (3,3,2f,f)), so checkpoints and ONNX/torch
    imports are interchangeable; only the compute schedule differs (see
    ops.conv_blocks.conv_block_dual).
    """

    features: int
    num_groups: int = 8
    pallas_gn: bool = False

    @nn.compact
    def __call__(self, x_up: jax.Array, x_skip: jax.Array,
                 act_scales=None) -> jax.Array:
        f = self.features
        g = resolve_group_count(f, self.num_groups)
        params = {
            "conv1": self.param("conv1", torch_conv_kernel_init, (3, 3, 2 * f, f)),
            "gn1_scale": self.param("gn1_scale", nn.initializers.ones, (f,)),
            "gn1_bias": self.param("gn1_bias", nn.initializers.zeros, (f,)),
            "conv2": self.param("conv2", torch_conv_kernel_init, (3, 3, f, f)),
            "gn2_scale": self.param("gn2_scale", nn.initializers.ones, (f,)),
            "gn2_bias": self.param("gn2_bias", nn.initializers.zeros, (f,)),
        }
        act_hook = (None if act_scales is None
                    else lambda t, name: _act_site(self, t, name, act_scales))
        return conv_block_dual(x_up, x_skip, params, num_groups=g,
                               pallas_gn=self.pallas_gn, act_hook=act_hook)


class UpConv2x(nn.Module):
    """ConvTranspose2d(k=2, s=2) equivalent (reference: src/model.py:47-53)."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param(
            "weight", torch_convT_kernel_init, (self.in_features, self.out_features, 2, 2)
        )
        b = self.param("bias", _uniform_bias_init(self.out_features * 4), (self.out_features,))
        return upsample2x_matmul(x, w, b)


class LightweightUNet(nn.Module):
    """Production de-glaring U-Net (486,409 params at default config).

    Input/output: NHWC float arrays, grayscale (C=1), values in [0, 1]
    (output is NOT clipped — clipping happens in post-processing, matching
    reference: evaluate.py:251 vs :264 semantics).
    """

    in_channels: int = 1
    out_channels: int = 1
    num_groups: int = 8
    features_start: int = 8
    dtype: Any = jnp.float32  # compute dtype (use jnp.bfloat16 for speed)
    #: rematerialize each block in the backward pass (jax.checkpoint) —
    #: trades ~1/3 more FLOPs for dropping stored activations, enabling
    #: much larger training batches in HBM
    remat: bool = False
    #: Pallas fused conv+GN+SiLU kernels: False = XLA everywhere,
    #: True = fused at every encoder/bottleneck block, "auto" = only the
    #: high-channel blocks (f >= 64) where the MXU contraction is efficient
    fused_blocks: Any = False
    #: fuse GN+SiLU pairs via the flat streaming Pallas kernel
    #: (convs stay on XLA); no-op off TPU
    pallas_gn: bool = False

    def _fused_for(self, features: int):
        if self.fused_blocks == "auto":
            return features >= 64
        return bool(self.fused_blocks)

    @nn.compact
    def __call__(self, x: jax.Array, act_scales=None) -> jax.Array:
        """``act_scales``: optional int8-activation quantization (serving
        only — see ops.quant). None = exact reference numerics; "calib" =
        record per-site per-channel max|x| into the mutable ``act_stats``
        collection; a scales pytree (from ops.quant.scales_from_act_stats)
        = store every inter-fusion activation as int8 in HBM."""
        if self.remat and act_scales is not None:
            # lifted jax.checkpoint rejects the "calib" string / scales
            # pytree call argument; the combination is also semantically
            # pointless (remat is a training memory knob, act_scales a
            # serving quantization knob) — fail with the reason instead of
            # an opaque TypeError inside the transform
            raise ValueError(
                "remat=True cannot be combined with act_scales; rebuild "
                "the model with remat=False for calibration/int8 serving")
        f0 = self.features_start
        f = [f0, f0 * 2, f0 * 4, f0 * 8, f0 * 16]
        g = self.num_groups

        conv_block = nn.remat(ConvBlock) if self.remat else ConvBlock
        block = lambda feats, groups, name: conv_block(
            feats, groups, fused=self._fused_for(feats),
            pallas_gn=self.pallas_gn, name=name)
        dual_block = nn.remat(DualConvBlock) if self.remat else DualConvBlock
        dual = partial(dual_block, pallas_gn=self.pallas_gn)
        aq = lambda t, name: _act_site(self, t, name, act_scales)
        sub = lambda name: _sub_scales(act_scales, name)

        x = x.astype(self.dtype)

        enc1 = block(f[0], g, name="enc1")(x, act_scales=sub("enc1"))
        enc2 = block(f[1], g, name="enc2")(
            aq(avg_pool_2x2(enc1), "p1"), act_scales=sub("enc2"))
        enc3 = block(f[2], g, name="enc3")(
            aq(avg_pool_2x2(enc2), "p2"), act_scales=sub("enc3"))
        enc4 = block(f[3], g, name="enc4")(
            aq(avg_pool_2x2(enc3), "p3"), act_scales=sub("enc4"))

        bottleneck = block(f[4], g, name="bottleneck")(
            aq(avg_pool_2x2(enc4), "p4"), act_scales=sub("bottleneck"))

        d4 = aq(UpConv2x(f[4], f[3], name="upconv4")(bottleneck), "u4")
        d4 = dual(f[3], g, name="dec4")(d4, enc4, act_scales=sub("dec4"))
        d3 = aq(UpConv2x(f[3], f[2], name="upconv3")(d4), "u3")
        d3 = dual(f[2], g, name="dec3")(d3, enc3, act_scales=sub("dec3"))
        d2 = aq(UpConv2x(f[2], f[1], name="upconv2")(d3), "u2")
        d2 = dual(f[1], g, name="dec2")(d2, enc2, act_scales=sub("dec2"))
        d1 = aq(UpConv2x(f[1], f[0], name="upconv1")(d2), "u1")
        d1 = dual(f[0], g, name="dec1")(d1, enc1, act_scales=sub("dec1"))

        wout = self.param("output_conv_weight", torch_conv_kernel_init, (1, 1, f[0], self.out_channels))
        bout = self.param("output_conv_bias", _uniform_bias_init(f[0]), (self.out_channels,))
        out = conv2d(d1, wout, bout)
        return out.astype(jnp.float32)
