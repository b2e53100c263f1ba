"""Weights-only extraction CLI (reference: scripts/extract_weights.py:5-88).

Loads any supported checkpoint (orbax training checkpoint with optimizer
state, .pth, .onnx) and writes a params-only artifact — an orbax directory
by default, or .npz / .onnx by output extension.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Extract and save only the model parameters from a checkpoint."
    )
    p.add_argument("checkpoint_path")
    p.add_argument("output_path")
    args = p.parse_args(argv)

    if not os.path.exists(args.checkpoint_path):
        print(f"Error: Checkpoint file not found at {args.checkpoint_path}")
        return 1

    import jax
    import numpy as np

    from ..eval.harness import load_model_for_eval

    _, params = load_model_for_eval(args.checkpoint_path)
    params = jax.tree_util.tree_map(np.asarray, params)

    if args.output_path.endswith(".npz"):
        def flat(tree, prefix=()):
            out = {}
            if isinstance(tree, dict):
                for k, v in tree.items():
                    out.update(flat(v, prefix + (k,)))
            else:
                out["/".join(prefix)] = tree
            return out

        np.savez(args.output_path, **flat(params))
    elif args.output_path.endswith(".onnx"):
        from ..modelio.onnx_writer import export_lightweight_unet

        export_lightweight_unet(params, args.output_path)
    else:
        from ..train.checkpoint import save_checkpoint

        save_checkpoint(args.output_path, params=params)
    print(f"Model parameters saved to: {args.output_path}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
