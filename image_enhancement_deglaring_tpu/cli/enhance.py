"""Batch de-glaring CLI (reference: main.py:13-136 — file-or-directory
input, PNG outputs, optional side-by-side visualization)."""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="De-glare images using the trained model")
    p.add_argument("--input", type=str, required=True,
                   help="Path to input image or directory")
    p.add_argument("--output_dir", type=str, default="./results")
    p.add_argument("--model_path", type=str, default="./models/best_model")
    p.add_argument("--batch_size", type=int, default=1,
                   help="images per device batch in resize mode "
                        "(reference: main.py:19); tile mode batches each "
                        "image's tiles internally and ignores this")
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--mode", type=str, default="resize", choices=["resize", "tile"])
    p.add_argument("--tile_overlap", type=int, default=32,
                   help="tile-mode overlap in pixels (must be < the tile "
                        "size, i.e. < --image_size); same flag as "
                        "cli.serve — previously unexposed here, which made "
                        "tile mode unusable at --image_size <= 32")
    p.add_argument("--data_parallel", type=int, nargs="?", const=0,
                   default=None, metavar="N",
                   help="shard work across N local chips (omit N = every "
                        "local device): resize mode shards image batches "
                        "(--batch_size rounds up to a mesh multiple), tile "
                        "mode shards each image's tile batches — same "
                        "resolver as cli.serve --data_parallel")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import numpy as np
    import jax.numpy as jnp
    from PIL import Image

    from ..data.pipeline import decode_inference_image
    from ..eval import load_model_for_eval
    from ..serve import InferenceEngine, TiledInference

    os.makedirs(args.output_dir, exist_ok=True)
    apply_fn, params = load_model_for_eval(args.model_path,
                                           compute_dtype=jnp.float32)
    from ..models import get_model_size_mb

    print(f"Model loaded successfully - Size: {get_model_size_mb(params):.2f} MB")

    from .serve import build_serving_mesh

    mesh, batch_size = build_serving_mesh(args.data_parallel,
                                          max(1, args.batch_size))
    if mesh is not None:
        print(f"batch inference data-parallel over {mesh.devices.size} "
              f"chips (batch {batch_size})")
    if args.mode == "tile":
        tiler = TiledInference(apply_fn, params, tile=args.image_size,
                               overlap=args.tile_overlap,
                               compute_dtype=jnp.float32, mesh=mesh)
        if args.batch_size > 1:
            print("Note: tile mode batches each image's tiles internally; "
                  "--batch_size is ignored")
    else:
        engine = InferenceEngine(apply_fn, params, image_size=args.image_size,
                                 max_batch_size=batch_size,
                                 compute_dtype=jnp.float32, warmup=False,
                                 mesh=mesh)

    if os.path.isfile(args.input):
        files = [args.input]
    elif os.path.isdir(args.input):
        files = sorted(
            os.path.join(args.input, f) for f in os.listdir(args.input)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        print(f"Found {len(files)} images to process")
    else:
        raise SystemExit(f"Input path not found: {args.input}")

    def results():
        if args.mode == "tile":
            for path in files:
                print(f"Processing image: {path}")
                img = np.asarray(Image.open(path).convert("L"))
                yield path, tiler(img.astype(np.uint8))
            return
        # decode one image at a time and flush the accumulated prefix on a
        # decode failure, so a corrupt file never discards the outputs of
        # earlier images in the same chunk (single-image behavior parity)
        pending_paths: list[str] = []
        pending_xs: list[np.ndarray] = []

        def flush():
            if not pending_paths:
                return
            outs = engine.infer_batch(np.stack(pending_xs))
            for p, out in zip(list(pending_paths), outs):
                yield p, out
            pending_paths.clear()
            pending_xs.clear()

        for path in files:
            print(f"Processing image: {path}")
            try:
                x = decode_inference_image(path, args.image_size)
            except Exception:
                yield from flush()
                raise
            pending_paths.append(path)
            pending_xs.append((x * 255).astype(np.uint8))  # [0,1] -> uint8
            if len(pending_paths) == batch_size:
                yield from flush()
        yield from flush()

    written: set[str] = set()
    for path, out in results():
        # always write PNG (documented contract; reference: main.py:98) —
        # keeping a .jpg name would save lossy AND collide with the
        # visualization path below; uniquify if two inputs share a stem
        # (scan.png + scan.jpg must not clobber each other)
        stem = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(args.output_dir, stem + ".png")
        n = 1
        while out_path in written:
            out_path = os.path.join(args.output_dir, f"{stem}_{n}.png")
            n += 1
        written.add(out_path)
        Image.fromarray(out, mode="L").save(out_path)
        print(f"Output saved to: {out_path}")
        if args.visualize:
            # the comparison figure joins the collision set too: an input
            # literally named x_comparison.png must not be clobbered by
            # x.png's visualization (and vice versa)
            vis_path = _visualize(path, out, out_path, written)
            written.add(vis_path)

    print(f"All images processed and saved to: {args.output_dir}")


def _visualize(input_path, output_image, output_path, taken=None):
    """Side-by-side figure (reference: main.py:40-59); returns the path
    written, uniquified against ``taken``."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from PIL import Image

    input_image = np.array(Image.open(input_path).convert("L"))
    fig, ax = plt.subplots(1, 2, figsize=(10, 5))
    ax[0].imshow(input_image, cmap="gray")
    ax[0].set_title("Input Image (with glare)")
    ax[0].axis("off")
    ax[1].imshow(output_image, cmap="gray")
    ax[1].set_title("De-glared Image")
    ax[1].axis("off")
    fig.tight_layout()
    base, _ext = os.path.splitext(output_path)
    vis_path = base + "_comparison.png"
    n = 1
    while vis_path in (taken or set()):
        vis_path = f"{base}_comparison_{n}.png"
        n += 1
    fig.savefig(vis_path)
    plt.close(fig)
    return vis_path


if __name__ == "__main__":
    main()
