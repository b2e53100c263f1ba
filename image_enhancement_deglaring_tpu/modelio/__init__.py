"""Model import/export without external runtimes.

- ``onnx_reader``: minimal pure-Python ONNX (protobuf wire format) parser —
  enough to load graph initializers and topology from the reference's
  ``best_model.onnx`` artifact for weight import. The environment has no
  onnx/onnxruntime packages, and we only need tensors + node wiring.
- ``onnx_writer``: minimal ONNX exporter for all three model families
  (opset 11, dynamic batch/H/W axes), mirroring the reference exporter's
  contract (reference: scripts/export_to_onnx.py:134-161).
- ``onnx_exec``: pure-numpy executor for the exported op vocabulary — the
  verification role ONNX Runtime plays for the reference
  (reference: evaluate.py:73-140) in an environment without an ORT wheel.
- ``params_import``: map ONNX / torch state-dict weights onto our NHWC
  Flax parameter pytrees.
"""

from .onnx_exec import run_graph, run_onnx
from .onnx_reader import load_onnx, OnnxGraph, OnnxNode
from .onnx_writer import (
    export_enhanced_unet,
    export_lightweight_unet,
    export_optimized_unet,
)
from .params_import import (
    arch_from_param_keys,
    detect_model_arch,
    enhanced_unet_params_from_onnx,
    enhanced_unet_params_from_state_dict,
    lightweight_unet_params_from_onnx,
    lightweight_unet_params_from_state_dict,
    load_torch_state_dict,
    optimized_unet_params_from_onnx,
    optimized_unet_params_from_state_dict,
)

__all__ = [
    "load_onnx",
    "OnnxGraph",
    "OnnxNode",
    "run_graph",
    "run_onnx",
    "arch_from_param_keys",
    "detect_model_arch",
    "export_enhanced_unet",
    "export_lightweight_unet",
    "export_optimized_unet",
    "enhanced_unet_params_from_onnx",
    "enhanced_unet_params_from_state_dict",
    "lightweight_unet_params_from_onnx",
    "lightweight_unet_params_from_state_dict",
    "load_torch_state_dict",
    "optimized_unet_params_from_onnx",
    "optimized_unet_params_from_state_dict",
]
