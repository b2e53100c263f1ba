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
    def __call__(self, x: jax.Array) -> jax.Array:
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
            return fused_conv3x3_gn_silu(y, w2, s2, b2, num_groups=g)

        if self.pallas_gn:
            from ..ops.pallas_kernels import fused_group_norm_silu as _gns

            def gn_silu(y, s, b):
                return _gns(y, s, b, num_groups=g)
        else:
            def gn_silu(y, s, b):
                return silu(group_norm(y, s, b, num_groups=g))

        y = conv2d(x, w1, padding=1)
        y = gn_silu(y, s1, b1)
        y = conv2d(y, w2, padding=1)
        y = gn_silu(y, s2, b2)
        return y


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
    def __call__(self, x_up: jax.Array, x_skip: jax.Array) -> jax.Array:
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
        return conv_block_dual(x_up, x_skip, params, num_groups=g,
                               pallas_gn=self.pallas_gn)


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
    def __call__(self, x: jax.Array) -> jax.Array:
        f0 = self.features_start
        f = [f0, f0 * 2, f0 * 4, f0 * 8, f0 * 16]
        g = self.num_groups

        conv_block = nn.remat(ConvBlock) if self.remat else ConvBlock
        block = lambda feats, groups, name: conv_block(
            feats, groups, fused=self._fused_for(feats),
            pallas_gn=self.pallas_gn, name=name)
        dual_block = nn.remat(DualConvBlock) if self.remat else DualConvBlock
        dual = partial(dual_block, pallas_gn=self.pallas_gn)

        x = x.astype(self.dtype)

        enc1 = block(f[0], g, name="enc1")(x)
        enc2 = block(f[1], g, name="enc2")(avg_pool_2x2(enc1))
        enc3 = block(f[2], g, name="enc3")(avg_pool_2x2(enc2))
        enc4 = block(f[3], g, name="enc4")(avg_pool_2x2(enc3))

        bottleneck = block(f[4], g, name="bottleneck")(avg_pool_2x2(enc4))

        d4 = UpConv2x(f[4], f[3], name="upconv4")(bottleneck)
        d4 = dual(f[3], g, name="dec4")(d4, enc4)
        d3 = UpConv2x(f[3], f[2], name="upconv3")(d4)
        d3 = dual(f[2], g, name="dec3")(d3, enc3)
        d2 = UpConv2x(f[2], f[1], name="upconv2")(d3)
        d2 = dual(f[1], g, name="dec2")(d2, enc2)
        d1 = UpConv2x(f[1], f[0], name="upconv1")(d2)
        d1 = dual(f[0], g, name="dec1")(d1, enc1)

        wout = self.param("output_conv_weight", torch_conv_kernel_init, (1, 1, f[0], self.out_channels))
        bout = self.param("output_conv_bias", _uniform_bias_init(f[0]), (self.out_channels,))
        out = conv2d(d1, wout, bout)
        return out.astype(jnp.float32)
