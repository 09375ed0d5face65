#!/usr/bin/env python
"""Entry shim for the AdaptEvery recipe (reference train_AdaptEvery.py equivalent).

Equivalent to: python scripts/train.py method=adaptevery [overrides...]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from train import main  # noqa: E402

if __name__ == "__main__":
    main(["method=adaptevery"] + sys.argv[1:])
