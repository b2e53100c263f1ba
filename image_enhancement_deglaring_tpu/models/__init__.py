"""Flax model zoo: the production LightweightUNet plus the reference's
capability-parity variants (OptimizedUNet, EnhancedUNet)."""

from .unet import LightweightUNet
from .optimized_unet import OptimizedUNet
from .enhanced_unet import EnhancedUNet
from .model_utils import (
    calibrate_act_scales,
    count_parameters,
    dequantize_params_int8,
    get_model_size_mb,
    prune_params,
    quantize_params_int8,
)

__all__ = [
    "LightweightUNet",
    "OptimizedUNet",
    "EnhancedUNet",
    "calibrate_act_scales",
    "count_parameters",
    "dequantize_params_int8",
    "get_model_size_mb",
    "prune_params",
    "quantize_params_int8",
]
