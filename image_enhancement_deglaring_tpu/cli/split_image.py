"""Triptych splitter CLI (reference: scripts/split_image.py:7-74).

Splits a [ground-truth | glared | mask] strip into three PNGs named
{base}_ground_truth.png / {base}_glared.png / {base}_mask.png.
"""

from __future__ import annotations

import argparse
import os
import sys


def split_image(image_path: str, output_dir: str | None = None) -> bool:
    from PIL import Image

    output_dir = output_dir or (os.path.dirname(image_path) or ".")
    os.makedirs(output_dir, exist_ok=True)
    try:
        img = Image.open(image_path)
    except Exception as e:
        print(f"Error opening image: {e}")
        return False

    base = os.path.splitext(os.path.basename(image_path))[0]
    width, height = img.size
    part = width // 3
    names = ("ground_truth", "glared", "mask")
    print("Images saved to:")
    for i, name in enumerate(names):
        crop = img.crop((part * i, 0, part * (i + 1) if i < 2 else width, height))
        path = os.path.join(output_dir, f"{base}_{name}.png")
        crop.save(path)
        print(f"  {name.replace('_', ' ').capitalize()}: {path}")
    return True


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Split a combined image into ground truth, glared image, and glare mask."
    )
    p.add_argument("image_path")
    p.add_argument("--output-dir", "-o", default=None)
    args = p.parse_args(argv)
    if not os.path.exists(args.image_path):
        print(f"Error: Image file not found: {args.image_path}")
        return 1
    return 0 if split_image(args.image_path, args.output_dir) else 1


if __name__ == "__main__":
    sys.exit(main())
