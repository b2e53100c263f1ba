"""ONNX export CLI (reference: scripts/export_to_onnx.py:251-262 usage).

Exports a checkpoint (orbax dir / .pth / .onnx re-export) as an opset-11
ONNX model with dynamic batch/height/width axes named 'input'/'output'.
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Export the de-glaring model to ONNX")
    p.add_argument("--model_path", type=str, required=True,
                   help="orbax checkpoint dir, .pth, or .onnx")
    p.add_argument("--output", type=str, default="best_model.onnx")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ..eval.harness import load_model_for_eval
    from ..modelio.onnx_writer import export_lightweight_unet

    _, params = load_model_for_eval(args.model_path)
    import jax
    import numpy as np

    params = jax.tree_util.tree_map(np.asarray, params)
    out = export_lightweight_unet(params, args.output)
    import os

    print(f"Model exported to {out} ({os.path.getsize(out):,} bytes, "
          f"opset 11, dynamic batch/height/width)")


if __name__ == "__main__":
    main()
