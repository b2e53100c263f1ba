"""Pure-JAX numeric ops used by the model zoo and pipelines.

Everything here is functional, jit-safe, and laid out NHWC (TPU-native:
channels on the 128-wide lane dimension, spatial dims on sublanes).
"""

from .conv_blocks import (
    conv2d,
    conv_block,
    conv_block_dual,
    avg_pool_2x2,
    max_pool_2x2,
    upsample2x_matmul,
    upsample_nearest_2x,
    group_norm,
    silu,
    resolve_group_count,
)
from .pallas_kernels import fused_group_norm_silu, fused_conv3x3_gn_silu
from .metrics import psnr, ssim, l1_loss, batched_psnr_ssim
from .image import (
    rgb_to_gray_luminance,
    split_triptych,
    resize_bilinear,
    to_uint8,
    from_uint8,
    pad_to_multiple,
)

__all__ = [
    "conv2d",
    "conv_block",
    "conv_block_dual",
    "fused_group_norm_silu",
    "fused_conv3x3_gn_silu",
    "avg_pool_2x2",
    "max_pool_2x2",
    "upsample2x_matmul",
    "upsample_nearest_2x",
    "group_norm",
    "silu",
    "resolve_group_count",
    "psnr",
    "ssim",
    "l1_loss",
    "batched_psnr_ssim",
    "rgb_to_gray_luminance",
    "split_triptych",
    "resize_bilinear",
    "to_uint8",
    "from_uint8",
    "pad_to_multiple",
]
