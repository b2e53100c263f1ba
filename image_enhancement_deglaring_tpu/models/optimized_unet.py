"""OptimizedUNet — 4-level U-Net with SE channel attention and
nearest-upsample decoder (capability parity with
reference: src/optimized_model.py:6-158).

Structure: blocks are [Conv3x3 -> GroupNorm -> SiLU] x2 with groups=1 for
the stem, 8 in the bottleneck, and 4 elsewhere (matching the reference
exactly: src/optimized_model.py:32 stem, :47-50 bottleneck GroupNorm(8),
:76 block default 4); AvgPool 2x2 downsampling; decoder upsampling is
nearest-2x + Conv3x3 + GN(4) + SiLU; squeeze-excite channel attention on
each skip connection (reduction 16, floor 8); 1x1 output conv.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.conv_blocks import (
    avg_pool_2x2,
    conv2d,
    group_norm,
    silu,
    upsample_nearest_2x,
)
from .unet import ConvBlock, torch_conv_kernel_init, _uniform_bias_init


class ChannelAttention(nn.Module):
    """Squeeze-and-excitation gate (reference: src/optimized_model.py:161-202)."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.channels
        reduced = max(c // self.reduction, 8)
        w1 = self.param("fc1", torch_conv_kernel_init, (1, 1, c, reduced))
        w2 = self.param("fc2", torch_conv_kernel_init, (1, 1, reduced, c))
        # global average pool over H, W -> (N, 1, 1, C)
        avg = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
        h = silu(conv2d(avg, w1))
        gate = jax.nn.sigmoid(conv2d(h, w2))
        return x * gate


class UpBlockNearest(nn.Module):
    """nearest-2x upsample + Conv3x3 + GN(4) + SiLU (reference: src/optimized_model.py:100-116)."""

    out_features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        f = self.out_features
        w = self.param("conv", torch_conv_kernel_init, (3, 3, x.shape[-1], f))
        s = self.param("gn_scale", nn.initializers.ones, (f,))
        b = self.param("gn_bias", nn.initializers.zeros, (f,))
        y = upsample_nearest_2x(x)
        y = conv2d(y, w, padding=1)
        return silu(group_norm(y, s, b, num_groups=4))


class OptimizedUNet(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    init_features: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        f = self.init_features
        x = x.astype(self.dtype)

        enc1 = ConvBlock(f, num_groups=1, name="enc1")(x)
        enc2 = ConvBlock(f * 2, num_groups=4, name="enc2")(avg_pool_2x2(enc1))
        enc3 = ConvBlock(f * 4, num_groups=4, name="enc3")(avg_pool_2x2(enc2))
        enc4 = ConvBlock(f * 8, num_groups=4, name="enc4")(avg_pool_2x2(enc3))

        bottleneck = ConvBlock(f * 16, num_groups=8, name="bottleneck")(avg_pool_2x2(enc4))

        d4 = UpBlockNearest(f * 8, name="upconv4")(bottleneck)
        a4 = ChannelAttention(f * 8, name="attention4")(enc4)
        d4 = ConvBlock(f * 8, num_groups=4, name="dec4")(jnp.concatenate([d4, a4], axis=-1))

        d3 = UpBlockNearest(f * 4, name="upconv3")(d4)
        a3 = ChannelAttention(f * 4, name="attention3")(enc3)
        d3 = ConvBlock(f * 4, num_groups=4, name="dec3")(jnp.concatenate([d3, a3], axis=-1))

        d2 = UpBlockNearest(f * 2, name="upconv2")(d3)
        a2 = ChannelAttention(f * 2, name="attention2")(enc2)
        d2 = ConvBlock(f * 2, num_groups=4, name="dec2")(jnp.concatenate([d2, a2], axis=-1))

        d1 = UpBlockNearest(f, name="upconv1")(d2)
        a1 = ChannelAttention(f, name="attention1")(enc1)
        d1 = ConvBlock(f, num_groups=4, name="dec1")(jnp.concatenate([d1, a1], axis=-1))

        wout = self.param("output_weight", torch_conv_kernel_init, (1, 1, f, self.out_channels))
        bout = self.param("output_bias", _uniform_bias_init(f), (self.out_channels,))
        return conv2d(d1, wout, bout).astype(jnp.float32)
