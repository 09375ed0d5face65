#!/usr/bin/env python
"""Entry shim for RAIN style-net pretraining (reference pretrain_RAIN.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from train import main  # noqa: E402

if __name__ == "__main__":
    main(["method=pretrain_rain"] + sys.argv[1:])
