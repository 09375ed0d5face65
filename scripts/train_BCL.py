#!/usr/bin/env python
"""Entry shim for the BCL recipe (reference train_BCL.py equivalent).

Equivalent to: python scripts/train.py method=bcl [overrides...]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from train import main  # noqa: E402

if __name__ == "__main__":
    main(["method=bcl"] + sys.argv[1:])
