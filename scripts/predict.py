#!/usr/bin/env python
"""Batched inference / serving entry: segment a directory of slices.

Loads a trained checkpoint, runs jit-compiled batched inference on TPU, and
writes per-slice PNG masks (class ids x 60 for visibility). When ground-truth
masks are available it also prints the per-class Dice/HD95/ASSD table.

Usage:
  python scripts/predict.py method=slcl data.dataset=synthetic \
      run.restore_from=best out_dir=/tmp/preds
  python scripts/predict.py method=slcl data.dataset=mmwhs \
      data.data_dir=$DATA run.restore_from=/runs/.../ckpt_best out_dir=preds
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from slcl_tpu.utils.jaxenv import configure_jax  # noqa: E402

configure_jax()

import cv2  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from slcl_tpu.config import Config, apply_recipe  # noqa: E402


def main(argv):
    out_dir = next((a.split("=", 1)[1] for a in argv if a.startswith("out_dir=")),
                   "preds")
    argv = [a for a in argv if not a.startswith("out_dir=")]
    method = next((a.split("=", 1)[1] for a in argv if a.startswith("method=")),
                  "baseline")
    cfg = Config()
    cfg.method = method
    cfg = apply_recipe(cfg)  # presets change param-tree structure (phead!)
    cfg = Config.from_cli(argv, base=cfg)
    cfg.method = method

    from slcl_tpu.data.loader import Loader
    from slcl_tpu.eval.evaluator import evaluate_arrays
    from slcl_tpu.train.trainer import Trainer
    from slcl_tpu.utils.tables import results_to_markdown

    trainer = Trainer(cfg)
    if cfg.run.restore_from:
        trainer.restore_checkpoint(cfg.run.restore_from, params_only=True)
        print(f"restored '{cfg.run.restore_from}'")

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    loader = Loader(trainer.datasets["test_t"], cfg.data.eval_bs,
                    shuffle=False, drop_last=False,
                    num_threads=cfg.data.num_workers)
    variables = {"params": trainer.state.seg.params}
    if trainer.state.seg.batch_stats:
        variables["batch_stats"] = trainer.state.seg.batch_stats

    t0 = time.perf_counter()
    preds, gts = trainer.evaluator.predict(variables, loader)
    dt = time.perf_counter() - t0
    print(f"inference: {len(preds)} slices in {dt:.2f}s "
          f"({len(preds) / dt:.1f} img/s incl. host IO)")

    names_loader = Loader(trainer.datasets["test_t"], cfg.data.eval_bs,
                          shuffle=False, drop_last=False, num_threads=1)
    names = [n for batch in names_loader for n in batch[-1]]
    for name, p in zip(names, preds):
        cv2.imwrite(str(out / f"{Path(str(name)).stem}_pred.png"),
                    (p * 60).astype(np.uint8))
    print(f"wrote {len(preds)} masks to {out}")

    if gts is not None and np.any(gts):
        results = evaluate_arrays(preds, gts, klc=cfg.run.klc,
                                  num_classes=cfg.model.num_classes)
        print(results_to_markdown(results))
    return preds


if __name__ == "__main__":
    main(sys.argv[1:])
