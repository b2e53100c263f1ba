"""Dataset validator CLI (reference: scripts/check_png.py)."""

import sys

from ..data.validate import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "SD1"))
