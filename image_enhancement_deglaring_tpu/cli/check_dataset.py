"""Dataset validator CLI (reference: scripts/check_png.py)."""

import argparse
import os
import sys

from ..data.validate import main as validate_main


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Validate an SD1 dataset directory (triptych dimensions, "
                    "RGBA mode, gray value range)")
    p.add_argument("data_dir", nargs="?", default="SD1",
                   help="dataset root (default: SD1)")
    args = p.parse_args(argv)
    if not os.path.isdir(args.data_dir):
        print(f"Error: dataset directory not found: {args.data_dir}")
        return 1
    return validate_main(args.data_dir)


if __name__ == "__main__":
    sys.exit(main())
