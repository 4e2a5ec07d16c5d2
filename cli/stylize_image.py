#!/usr/bin/env python3
"""Dev-tree launcher: `python cli/stylize_image.py ...` without installing.

The implementation lives in faststyle_tpu.cli.stylize_image (packaged module); this
shim only puts the repo root on sys.path and re-exports its surface.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from faststyle_tpu.cli.stylize_image import main, setup_parser  # noqa: E402,F401

if __name__ == "__main__":
    main()
