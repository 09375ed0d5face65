#!/usr/bin/env python
"""Entry shim for the baseline recipe (reference train_baseline.py equivalent).

Equivalent to: python scripts/train.py method=baseline [overrides...]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from train import main  # noqa: E402

if __name__ == "__main__":
    main(["method=baseline"] + sys.argv[1:])
