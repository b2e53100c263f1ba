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
    p.add_argument("--model", type=str, default="auto",
                   choices=["auto", "lightweight", "optimized", "enhanced"],
                   help="model family of the checkpoint (auto = detect "
                        "from the artifact)")
    p.add_argument("--num_groups", type=int, default=8,
                   help="GroupNorm budget for lightweight .onnx output "
                        "(must match training, like cli.export_onnx)")
    args = p.parse_args(argv)

    if not os.path.exists(args.checkpoint_path):
        print(f"Error: Checkpoint file not found at {args.checkpoint_path}")
        return 1

    import jax
    import numpy as np

    from ..modelio import detect_model_arch

    arch = args.model
    if arch == "auto":
        arch = detect_model_arch(args.checkpoint_path)

    stats = None
    if arch == "enhanced":
        # params + BatchNorm running stats travel together
        from ..modelio import (
            enhanced_unet_params_from_onnx,
            enhanced_unet_params_from_state_dict,
            load_torch_state_dict,
        )

        lower = args.checkpoint_path.lower()
        if lower.endswith(".onnx"):
            params, stats = enhanced_unet_params_from_onnx(args.checkpoint_path)
        elif lower.endswith((".pth", ".pt")):
            params, stats = enhanced_unet_params_from_state_dict(
                load_torch_state_dict(args.checkpoint_path))
        elif lower.endswith(".npz"):
            from ..eval.harness import _unflatten_npz

            tree = _unflatten_npz(args.checkpoint_path)
            params, stats = tree["params"], tree["batch_stats"]
        else:  # orbax training checkpoint
            from ..train.checkpoint import restore_checkpoint

            item, _ = restore_checkpoint(args.checkpoint_path)
            params = item["params"]
            stats = item.get("model_state", {}).get("batch_stats")
            if stats is None:
                raise SystemExit(
                    f"{args.checkpoint_path} holds no batch_stats; an "
                    "EnhancedUNet artifact needs the BatchNorm running stats")
    else:
        from ..eval.harness import load_model_for_eval

        _, params = load_model_for_eval(args.checkpoint_path, model_arch=arch)
    params = jax.tree_util.tree_map(np.asarray, params)

    if args.output_path.endswith(".npz"):
        from ..utils.pytree import flatten_tree

        # for EnhancedUNet the BatchNorm running stats are part of the
        # weights (the torch state dict carries them too); nest both
        # collections so nothing is silently dropped
        tree = {"params": params, "batch_stats": stats} if stats else params
        np.savez(args.output_path, **flatten_tree(tree))
    elif args.output_path.endswith(".onnx"):
        from ..modelio.onnx_writer import (
            export_enhanced_unet,
            export_lightweight_unet,
            export_optimized_unet,
        )

        if arch == "enhanced":
            export_enhanced_unet(params, stats, args.output_path)
        elif arch == "optimized":
            export_optimized_unet(params, args.output_path)
        else:
            export_lightweight_unet(params, args.output_path,
                                    groups=args.num_groups)
    else:
        from ..train.checkpoint import save_checkpoint

        # for EnhancedUNet the BatchNorm running stats ride along as
        # model_state, the same layout the training loop checkpoints
        save_checkpoint(
            args.output_path, params=params,
            model_state={"batch_stats": stats} if stats is not None else None)
    print(f"Model parameters saved to: {args.output_path}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
