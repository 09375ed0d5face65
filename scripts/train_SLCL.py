#!/usr/bin/env python
"""Entry shim for the SLCL recipe (reference train_SLCL.py equivalent).

Equivalent to: python scripts/train.py method=slcl [overrides...]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from train import main  # noqa: E402

if __name__ == "__main__":
    main(["method=slcl"] + sys.argv[1:])
