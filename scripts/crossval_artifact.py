"""Cross-validate a candidate model artifact against the shipped one.

Generates a FRESH synthetic SD1-contract dataset (a seed neither model has
ever seen) and evaluates both artifacts on it with the production eval
harness — the promotion gate used before replacing
``deploy/models/best_model.onnx`` (provenance: deploy/models/README.md).

    python scripts/crossval_artifact.py --candidate /tmp/sd1_big/models/best_model

Prints one JSON line: per-model L1/PSNR/SSIM and the verdict.
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--candidate", required=True,
                   help=".onnx / .pth / .npz / orbax dir")
    p.add_argument(
        "--incumbent",
        # repo-rooted: the script is runnable from any CWD (the sys.path
        # bootstrap above already assumes so)
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "deploy", "models", "best_model.onnx"))
    p.add_argument("--n", type=int, default=128,
                   help="held-out triptychs to generate")
    p.add_argument("--seed", type=int, default=123,
                   help="generator seed — MUST differ from any training "
                        "seed (train_synthetic_demo uses 0, the shipped "
                        "artifact's original cross-val set used a second "
                        "draw); a fresh seed keeps this an honest held-out")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=8)
    args = p.parse_args()

    from image_enhancement_deglaring_tpu.data import (
        generate_synthetic_sd1,
        make_eval_loader,
    )
    from image_enhancement_deglaring_tpu.eval import evaluate
    from image_enhancement_deglaring_tpu.eval.harness import load_model_for_eval

    with tempfile.TemporaryDirectory(prefix="crossval_") as d:
        generate_synthetic_sd1(d, n_train=args.n, n_val=0, size=args.size,
                               seed=args.seed)
        loader = make_eval_loader(
            os.path.join(d, "train"), batch_size=args.batch_size,
            seed=42, image_size=args.size, cache_images=True)

        results = {}
        for name, path in (("candidate", args.candidate),
                           ("incumbent", args.incumbent)):
            apply_fn, params = load_model_for_eval(path)
            m = evaluate(apply_fn, params, loader,
                         batch_size=args.batch_size, progress=False)
            results[name] = {k: round(float(m[k]), 4)
                             for k in ("l1_loss", "psnr", "ssim")}

    cand, inc = results["candidate"], results["incumbent"]
    results["verdict"] = ("promote" if cand["psnr"] > inc["psnr"]
                          and cand["l1_loss"] <= inc["l1_loss"] * 1.02
                          else "keep_incumbent")
    results["n_heldout"] = args.n
    results["seed"] = args.seed
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
