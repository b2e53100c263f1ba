"""ONNX export CLI (reference: scripts/export_to_onnx.py:251-262 usage).

Exports a checkpoint (orbax dir / .pth / .onnx re-export) as an opset-11
ONNX model with dynamic batch/height/width axes named 'input'/'output'.
Supports all three model families like the reference's importlib-driven
exporter (reference: scripts/export_to_onnx.py:8-38 loads any model class).
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Export the de-glaring model to ONNX")
    p.add_argument("--model_path", type=str, required=True,
                   help="orbax checkpoint dir, .pth, or .onnx")
    p.add_argument("--model", type=str, default="lightweight",
                   choices=["lightweight", "optimized", "enhanced"],
                   help="model family the checkpoint belongs to")
    p.add_argument("--output", type=str, default="best_model.onnx")
    p.add_argument("--num_groups", type=int, default=8,
                   help="GroupNorm group budget the lightweight checkpoint "
                        "was trained with (LightweightUNet.num_groups; per-"
                        "block counts resolve to the largest divisor of the "
                        "block width <= this). Must match training — a "
                        "mismatch exports a mis-normalized graph.")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import numpy as np

    from ..eval.harness import load_model_for_eval

    if args.model == "enhanced":
        from ..modelio.onnx_writer import export_enhanced_unet

        # the eval loader handles every checkpoint format this repo can
        # produce (.pth / .onnx / .npz / orbax dir) and returns the
        # {params, batch_stats} bundle the stateful family needs
        _, bundle = load_model_for_eval(args.model_path, model_arch="enhanced")
        bundle = jax.tree_util.tree_map(np.asarray, bundle)
        out = export_enhanced_unet(bundle["params"], bundle["batch_stats"],
                                   args.output)
    else:
        from ..modelio.onnx_writer import (
            export_lightweight_unet,
            export_optimized_unet,
        )

        _, params = load_model_for_eval(args.model_path, model_arch=args.model)
        params = jax.tree_util.tree_map(np.asarray, params)
        if args.model == "optimized":
            out = export_optimized_unet(params, args.output)
        else:
            out = export_lightweight_unet(params, args.output,
                                          groups=args.num_groups)

    import os

    print(f"Model exported to {out} ({os.path.getsize(out):,} bytes, "
          f"opset 11, dynamic batch/height/width)")


if __name__ == "__main__":
    main()
