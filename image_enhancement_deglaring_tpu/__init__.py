"""TPU-native document de-glaring framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of the
JTZ18/image-enhancement-deglaring reference (PyTorch/ONNX-Runtime, see
reference README.md): U-Net glare removal on grayscale document images,
with training, hyperparameter sweeps, evaluation (PSNR/SSIM), batched
TPU serving, tiled full-resolution inference, and ONNX import/export.

Layout
------
- ``ops``      pure-JAX numerics: conv blocks, pooling, image ops, metrics,
               Pallas fused kernels
- ``models``   Flax model zoo: LightweightUNet (production), OptimizedUNet,
               EnhancedUNet
- ``data``     SD1 triptych pipeline, augmentations, synthetic data
- ``train``    jitted data-parallel training loop, LR control, checkpoints
- ``eval``     evaluation harness (L1 / PSNR / SSIM parity semantics)
- ``serve``    batched TPU inference engine + HTTP API + tiled inference
- ``parallel`` device mesh helpers + cross-chip hyperparameter sweeps
- ``modelio``  ONNX reader/writer and torch checkpoint import (no
               onnxruntime dependency)
- ``utils``    seeding, config, experiment logging
"""

__version__ = "0.1.0"
