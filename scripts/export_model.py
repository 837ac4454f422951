"""Thin launcher for the packaged export CLI (utils/export_cli.py);
installed wheels expose the same entry point as `manet-export`."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvpr2020_manet_tpu.utils.export_cli import main

if __name__ == "__main__":
    main()
