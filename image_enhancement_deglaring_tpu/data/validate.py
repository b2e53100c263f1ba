"""Dataset contract validator (reference: scripts/check_png.py:9-132).

Checks every PNG under {data_dir}/train and {data_dir}/val for:
- dimensions == required (1536x512 by default),
- RGBA mode (4 channels),
- fully decodable pixel data (truncated/corrupt files).

The reference's third check asserts grayscale values in [0, 255], which
is vacuous for uint8 data (the reference has the same dead branch); here
"invalid pixels" means the entropy-coded data itself fails to decode —
the failure mode that actually breaks the training pipeline mid-epoch.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def check_png_dimensions(data_dir: str = "SD1", required_width: int = 1536,
                         required_height: int = 512):
    """Returns (incorrect_dimensions, invalid_channels, invalid_pixels, total)."""
    from PIL import Image

    from .pipeline import list_image_paths

    data_path = Path(data_dir)
    if not data_path.is_dir():
        raise FileNotFoundError(f"Directory '{data_dir}' does not exist")

    incorrect_dimensions: list[tuple[str, int, int]] = []
    invalid_channels: list[tuple[str, str]] = []
    invalid_pixels: list[str] = []
    total = 0

    for subdir in ("train", "val"):
        sub = data_path / subdir
        if not sub.is_dir():
            continue
        # scan EXACTLY what the loader consumes (pipeline.list_image_paths:
        # recursive, any case, .png/.jpg/.jpeg) — a validator that sees a
        # narrower set than the training pipeline would report all-clear on
        # files that later break mid-epoch. Non-RGBA (incl. every JPEG,
        # which cannot carry alpha) is flagged by the mode check below.
        for png in (Path(p) for p in list_image_paths(str(sub))):
            total += 1
            rel = f"{subdir}/{png.relative_to(sub)}"
            try:
                with Image.open(png) as img:
                    w, h = img.size
                    if (w, h) != (required_width, required_height):
                        incorrect_dimensions.append((rel, w, h))
                    if img.mode != "RGBA":
                        invalid_channels.append((rel, img.mode))
                    # force the full entropy decode: a truncated or
                    # bit-flipped file raises here, not at open()
                    np.asarray(img.convert("L"))
            except Exception:
                invalid_pixels.append(rel)
    return incorrect_dimensions, invalid_channels, invalid_pixels, total


def main(data_dir: str = "SD1", required_width: int = 1536,
         required_height: int = 512) -> int:
    bad_dims, bad_chan, bad_pix, total = check_png_dimensions(
        data_dir, required_width, required_height)
    dims = f"{required_width}x{required_height}"
    print(f"Checked {total} image files in {data_dir}/train and {data_dir}/val")
    ok = True
    if bad_dims:
        ok = False
        print(f"✗ {len(bad_dims)} files with incorrect dimensions:")
        for rel, w, h in bad_dims:
            print(f"  {data_dir}/{rel}: {w}x{h} (should be {dims})")
    else:
        print(f"✓ All PNG files have the correct dimensions ({dims})")
    if bad_chan:
        ok = False
        print(f"✗ {len(bad_chan)} files with incorrect format:")
        for rel, mode in bad_chan:
            print(f"  {data_dir}/{rel}: {mode} (should be RGBA)")
    else:
        print("✓ All PNG files have the correct format (RGBA)")
    if bad_pix:
        ok = False
        print(f"✗ {len(bad_pix)} files with invalid pixel values")
    else:
        print("✓ All PNG files have valid grayscale pixel values [0-255]")
    return 0 if ok else 1


if __name__ == "__main__":
    import sys

    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "SD1"))
