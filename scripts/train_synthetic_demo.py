"""End-to-end demo: synthesize an SD1-format dataset, train the production
U-Net on the TPU, evaluate, and report PSNR/SSIM against the identity
baseline (run from the repo root: ``python scripts/train_synthetic_demo.py``).

The real SD1 dataset is not redistributable; the synthetic generator
honors its exact contract (1536x512 RGBA [gt | glared | mask] triptychs),
so every pipeline stage — decode, cache, augmentation, jitted bf16
training, on-device eval — runs exactly as it would on the real data.
"""

import argparse
import json
import os
import sys
import time

# runnable from anywhere: scripts/ is sys.path[0], the package lives one up
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default="/tmp/sd1_synthetic")
    p.add_argument("--out_dir", default="/tmp/sd1_synthetic/models")
    p.add_argument("--n_train", type=int, default=96)
    p.add_argument("--n_val", type=int, default=24)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--patience", type=int, default=40)
    p.add_argument("--size", type=int, default=512,
                   help="square image size (512 = the SD1 contract; "
                        "smaller sizes make CPU smoke runs tractable)")
    p.add_argument("--resident", action="store_true",
                   help="device-resident training: cache the decoded "
                        "dataset in HBM, one compiled dispatch per epoch, "
                        "device-side augmentation")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from image_enhancement_deglaring_tpu.data import (
        generate_synthetic_sd1,
        make_dataloaders,
        make_eval_loader,
    )
    from image_enhancement_deglaring_tpu.eval import evaluate
    from image_enhancement_deglaring_tpu.models import LightweightUNet
    from image_enhancement_deglaring_tpu.ops.metrics import batched_psnr_ssim
    from image_enhancement_deglaring_tpu.train.loop import train_model

    train_dir = os.path.join(args.data_dir, "train")
    # staleness check via a manifest of EVERY generation parameter — a
    # count-only check silently reused e.g. 128px triptychs for a --size
    # 512 run (the loader upscales, measuring the wrong experiment)
    manifest_path = os.path.join(args.data_dir, "dataset_manifest.json")
    wanted = {"n_train": args.n_train, "n_val": args.n_val,
              "size": args.size}
    have = None
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            have = json.load(f)
    n_existing = (len([f for f in os.listdir(train_dir) if f.endswith(".png")])
                  if os.path.isdir(train_dir) else 0)
    if have != wanted or n_existing != args.n_train:
        if n_existing:
            import shutil

            print(f"dataset at {args.data_dir} has {n_existing} train "
                  f"triptychs, want {args.n_train}; regenerating")
            for sub in ("train", "val"):
                shutil.rmtree(os.path.join(args.data_dir, sub),
                              ignore_errors=True)
        print(f"Generating synthetic SD1 ({args.n_train}+{args.n_val} triptychs)...")
        generate_synthetic_sd1(args.data_dir, n_train=args.n_train,
                               n_val=args.n_val, size=args.size, seed=0)
        with open(manifest_path, "w") as f:
            json.dump(wanted, f)

    train_loader, val_loader = make_dataloaders(
        train_dir, batch_size=args.batch_size,
        val_split=0.2, seed=42, image_size=args.size, cache_images=True,
        augment="none" if args.resident else "optimized",
    )
    print(f"train/val samples: {train_loader.num_samples}/{val_loader.num_samples}")

    xs, ys = next(iter(val_loader))
    p0, s0 = jax.jit(batched_psnr_ssim)(jnp.asarray(xs), jnp.asarray(ys))
    print(f"identity baseline: PSNR {float(p0.mean()):.2f} dB, "
          f"SSIM {float(s0.mean()):.4f}")

    model = LightweightUNet(dtype=jnp.bfloat16)
    t0 = time.time()
    best_params, _best_ms, best_val, _ = train_model(
        model, train_loader, val_loader, epochs=args.epochs,
        output_dir=args.out_dir, save_every=1000,
        validation_metrics_every=25, progress=False, patience=args.patience,
        resident=args.resident, device_augment=args.resident,
    )
    print(f"trained in {time.time() - t0:.0f}s; best val L1 {best_val:.4f}")

    # final evaluation: the generated held-out val/ when --n_val produced
    # one (those images are otherwise never read), else the 80/20 split
    val_dir = os.path.join(args.data_dir, "val")
    if args.n_val > 0 and os.path.isdir(val_dir):
        heldout = make_eval_loader(
            val_dir, batch_size=args.batch_size, seed=42,
            image_size=args.size, cache_images=True)
        eval_loader, which = heldout, f"held-out val/ ({heldout.num_samples})"
    else:
        eval_loader, which = val_loader, "train-split val"
    metrics = evaluate(model.apply, best_params, eval_loader,
                       batch_size=args.batch_size, progress=False)
    print(f"final ({which}): L1 {metrics['l1_loss']:.4f}, "
          f"PSNR {metrics['psnr']:.2f} dB, SSIM {metrics['ssim']:.4f}")


if __name__ == "__main__":
    main()
