#!/usr/bin/env python
"""Unified training CLI — replaces the reference's 9 train_*.py shims.

Usage:
  python scripts/train.py method=mpscl data.dataset=synthetic optim.epochs=5
  python scripts/train.py --config configs/slcl_mmwhs.yaml optim.lr=8e-4

Recipe presets (reference entry-script hardcodes):
  method=slcl      -> train_SLCL.py:6-48   (MPSCL path, paper hyperparams)
  method=mccl      -> train_MCCL.py:35-48  (soft labels + rMC + CNR)
  method=baseline  -> train_baseline.py:27-42
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from slcl_tpu.utils.jaxenv import configure_jax  # noqa: E402

configure_jax()

from slcl_tpu.config import Config, apply_recipe  # noqa: E402


def main(argv):
    if any(a in ("--help", "-h", "help") for a in argv):
        print(__doc__)
        print("methods: baseline adaptseg advent mpscl slcl mccl rain "
              "pretrain_rain adaptevery ddfseg bcl")
        print("overrides: section.key=value over slcl_tpu.config.Config "
              "(e.g. optim.lr=8e-4 data.fold=1 model.backbone=drunet)")
        return {}
    # recipe defaults are applied first, then CLI overrides win
    method = next((a.split("=", 1)[1] for a in argv if a.startswith("method=")),
                  "baseline")
    cfg = Config()
    cfg.method = method
    cfg = apply_recipe(cfg)
    cfg = Config.from_cli(argv, base=cfg)
    cfg.method = method
    if cfg.data.aug_counter is False and cfg.method == "mccl":
        cfg.data.aug_counter = True

    from slcl_tpu.train.trainer import Trainer
    trainer = Trainer(cfg)
    summary = trainer.train()
    if "best_val_dice" in summary:
        print("best val dice:", summary["best_val_dice"])
    else:
        print("best score:", summary.get("best_score"))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
