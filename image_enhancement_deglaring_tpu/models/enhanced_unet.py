"""EnhancedUNet — 5-level residual U-Net with attention gates, dilated
bottleneck, and sigmoid head (capability parity with
reference: src/model.py:135-361).

Uses BatchNorm (running stats in the ``batch_stats`` collection; flax
momentum 0.9 == torch's default momentum=0.1 update rate) and
Dropout(0.2) like the reference; call with ``train=True`` and a ``dropout``
rng during training, and ``mutable=["batch_stats"]`` to update stats.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.conv_blocks import conv2d, max_pool_2x2
from .unet import UpConv2x, torch_conv_kernel_init, _uniform_bias_init


class ResidualBlock(nn.Module):
    """Conv-BN-ReLU-Dropout-Conv-BN + projection shortcut
    (reference: src/model.py:189-237)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        f = self.features
        cin = x.shape[-1]

        w1 = self.param("conv1", torch_conv_kernel_init, (3, 3, cin, f))
        y = conv2d(x, w1, padding=1)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Dropout(0.2, deterministic=not train)(y)
        w2 = self.param("conv2", torch_conv_kernel_init, (3, 3, f, f))
        y = conv2d(y, w2, padding=1)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn2")(y)

        if cin != f:
            ws = self.param("shortcut_conv", torch_conv_kernel_init, (1, 1, cin, f))
            shortcut = conv2d(x, ws)
            shortcut = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="shortcut_bn")(shortcut)
        else:
            shortcut = x
        return nn.relu(y + shortcut)


class AttentionGate(nn.Module):
    """Additive attention gate on skip connections (reference: src/model.py:135-186)."""

    f_int: int

    @nn.compact
    def __call__(self, g: jax.Array, x: jax.Array, *, train: bool = False) -> jax.Array:
        wg = self.param("w_g", torch_conv_kernel_init, (1, 1, g.shape[-1], self.f_int))
        bg = self.param("w_g_bias", _uniform_bias_init(g.shape[-1]), (self.f_int,))
        wx = self.param("w_x", torch_conv_kernel_init, (1, 1, x.shape[-1], self.f_int))
        bx = self.param("w_x_bias", _uniform_bias_init(x.shape[-1]), (self.f_int,))
        wp = self.param("psi", torch_conv_kernel_init, (1, 1, self.f_int, 1))
        bp = self.param("psi_bias", _uniform_bias_init(self.f_int), (1,))

        g1 = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn_g")(conv2d(g, wg, bg))
        x1 = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn_x")(conv2d(x, wx, bx))
        psi = nn.relu(g1 + x1)
        psi = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn_psi")(conv2d(psi, wp, bp))
        return x * jax.nn.sigmoid(psi)


class EnhancedUNet(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    init_features: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        f = self.init_features
        x = x.astype(self.dtype)

        enc1 = ResidualBlock(f, name="enc1")(x, train=train)
        enc2 = ResidualBlock(f * 2, name="enc2")(max_pool_2x2(enc1), train=train)
        enc3 = ResidualBlock(f * 4, name="enc3")(max_pool_2x2(enc2), train=train)
        enc4 = ResidualBlock(f * 8, name="enc4")(max_pool_2x2(enc3), train=train)
        enc5 = ResidualBlock(f * 16, name="enc5")(max_pool_2x2(enc4), train=train)

        # Dilated bottleneck (reference: src/model.py:276-284)
        b = max_pool_2x2(enc5)
        wb1 = self.param("bottleneck_conv1", torch_conv_kernel_init, (3, 3, f * 16, f * 32))
        b = conv2d(b, wb1, padding=2, dilation=2)
        b = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bottleneck_bn1")(b)
        b = nn.relu(b)
        b = nn.Dropout(0.2, deterministic=not train)(b)
        wb2 = self.param("bottleneck_conv2", torch_conv_kernel_init, (3, 3, f * 32, f * 32))
        b = conv2d(b, wb2, padding=2, dilation=2)
        b = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bottleneck_bn2")(b)
        b = nn.relu(b)

        d5 = UpConv2x(f * 32, f * 16, name="upconv5")(b)
        a5 = AttentionGate(f * 8, name="attention5")(d5, enc5, train=train)
        d5 = ResidualBlock(f * 16, name="dec5")(jnp.concatenate([d5, a5], axis=-1), train=train)

        d4 = UpConv2x(f * 16, f * 8, name="upconv4")(d5)
        a4 = AttentionGate(f * 4, name="attention4")(d4, enc4, train=train)
        d4 = ResidualBlock(f * 8, name="dec4")(jnp.concatenate([d4, a4], axis=-1), train=train)

        d3 = UpConv2x(f * 8, f * 4, name="upconv3")(d4)
        a3 = AttentionGate(f * 2, name="attention3")(d3, enc3, train=train)
        d3 = ResidualBlock(f * 4, name="dec3")(jnp.concatenate([d3, a3], axis=-1), train=train)

        d2 = UpConv2x(f * 4, f * 2, name="upconv2")(d3)
        a2 = AttentionGate(f, name="attention2")(d2, enc2, train=train)
        d2 = ResidualBlock(f * 2, name="dec2")(jnp.concatenate([d2, a2], axis=-1), train=train)

        d1 = UpConv2x(f * 2, f, name="upconv1")(d2)
        a1 = AttentionGate(f // 2, name="attention1")(d1, enc1, train=train)
        d1 = ResidualBlock(f, name="dec1")(jnp.concatenate([d1, a1], axis=-1), train=train)

        wout = self.param("output_weight", torch_conv_kernel_init, (1, 1, f, self.out_channels))
        bout = self.param("output_bias", _uniform_bias_init(f), (self.out_channels,))
        out = conv2d(d1, wout, bout)
        # Sigmoid head keeps output in [0, 1] (reference: src/model.py:310-313)
        return jax.nn.sigmoid(out).astype(jnp.float32)
