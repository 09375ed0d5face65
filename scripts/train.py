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
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

# persistent compilation cache: first compile of each recipe is slow (remote
# XLA compile); subsequent runs are instant
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from slcl_tpu.config import Config  # noqa: E402


def apply_recipe(cfg: Config) -> Config:
    """Per-method hyperparameter presets mirroring the entry scripts."""
    m = cfg.method
    if m == "slcl":
        # train_SLCL.py: fold 0, epochs 300, resnet50/multilvl in the paper
        # repo; DRUNet is the native backbone with the matching (4,32)
        # center files.
        cfg.contrastive.src_temp = 0.1
        cfg.contrastive.trg_temp = 0.1
        cfg.contrastive.src_margin = 0.4
        cfg.contrastive.trg_margin = 0.2
        cfg.contrastive.class_center_m = 0.9
        cfg.contrastive.CNR = True
        cfg.contrastive.CNR_w = 4e-5
        cfg.contrastive.part = 2
        cfg.optim.lr = 8e-4
    elif m == "rain":
        cfg.rain.enabled = True
    elif m == "adaptevery":
        cfg.data.vert = True
        cfg.model.multilvl = True
        cfg.model.backbone = "resnet50"
    elif m == "ddfseg":
        cfg.optim.optimizer = "adam"
        cfg.optim.lr = 2e-4
        cfg.optim.lr_dis = 2e-4
    elif m == "mccl":
        cfg.contrastive.clda = True
        cfg.contrastive.wtd_ave = True
        cfg.contrastive.part = 2
        cfg.contrastive.inter_w = 1.0
        cfg.contrastive.CNR = True
        cfg.contrastive.CNR_w = 4e-5
        cfg.contrastive.tau = 0.1
        cfg.contrastive.ctd_mmt = 0.9
        cfg.model.phead = True
        cfg.optim.lr = 8e-4
        cfg.data.aug_counter = True
    return cfg


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
