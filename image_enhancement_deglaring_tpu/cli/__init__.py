"""Command-line entry points (python -m image_enhancement_deglaring_tpu.cli.<name>).

Parity map to the reference's scripts:

| reference                      | here              |
|--------------------------------|-------------------|
| optimized_train.py             | cli.train         |
| evaluate.py                    | cli.evaluate      |
| sweep.py                       | cli.sweep         |
| main.py (batch enhancer)       | cli.enhance       |
| api/app.py (uvicorn serving)   | cli.serve         |
| scripts/export_to_onnx.py      | cli.export_onnx   |
| scripts/extract_weights.py     | cli.extract_weights |
| scripts/split_image.py         | cli.split_image   |
| scripts/check_png.py           | cli.check_dataset |
| api/test_api.py                | cli.test_api      |

Additions without a reference counterpart:
- cli.make_synthetic — SD1-contract synthetic dataset generator
"""
