"""`python -m image_enhancement_deglaring_tpu` — list the CLI entry points."""

HELP = """image-enhancement-deglaring-tpu — TPU-native document de-glaring

Entry points (python -m image_enhancement_deglaring_tpu.cli.<name>):

  train            train a model (reference: optimized_train.py)
  evaluate         L1/PSNR/SSIM on a validation set (reference: evaluate.py)
  sweep            hyperparameter sweep across chips (reference: sweep.py)
  enhance          batch de-glaring CLI (reference: main.py)
  serve            HTTP API on the batched TPU engine (reference: api/app.py)
  test_api         API smoke tests (reference: api/test_api.py)
  export_onnx      export to opset-11 ONNX (reference: scripts/export_to_onnx.py)
  extract_weights  weights-only artifact (reference: scripts/extract_weights.py)
  split_image      triptych splitter (reference: scripts/split_image.py)
  check_dataset    SD1 contract validator (reference: scripts/check_png.py)
  make_synthetic   generate an SD1-contract synthetic dataset (no reference
                   counterpart; the real SD1 data is not redistributable)

Demo: python scripts/train_synthetic_demo.py
Docs: README.md, docs/PERF.md
"""

if __name__ == "__main__":
    print(HELP)
