#!/usr/bin/env python
"""Eval-only harness: restore a checkpoint and run the test evaluation
(reference Trainer_base_test.py intent — the snapshot there targets a stale
Evaluator signature and no longer runs; this is the working equivalent).

Usage:
  python scripts/evaluate.py method=slcl data.dataset=synthetic \
      run.out_dir=runs run.restore_from=best
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from slcl_tpu.utils.jaxenv import configure_jax  # noqa: E402

configure_jax()

from slcl_tpu.config import Config, apply_recipe  # noqa: E402


def main(argv):
    method = next((a.split("=", 1)[1] for a in argv if a.startswith("method=")),
                  "baseline")
    cfg = Config()
    cfg.method = method
    cfg = apply_recipe(cfg)  # presets change param-tree structure (phead!)
    cfg = Config.from_cli(argv, base=cfg)
    cfg.method = method

    from slcl_tpu.train.trainer import Trainer
    trainer = Trainer(cfg)
    tag = cfg.run.restore_from or "best"
    try:
        trainer.restore_checkpoint(tag, params_only=True)
        print(f"restored checkpoint '{tag}' (params+batch_stats)")
    except Exception as e:
        # evaluating random initial weights silently is worse than failing
        raise SystemExit(
            f"checkpoint restore failed for {tag!r}: {e}\n"
            "(check run.out_dir/run.apdx and that method/model flags match "
            "the training run — presets like mccl's model.phead change the "
            "parameter tree)")
    print("--- target test ---")
    results = trainer.eval("test_t", toprint=True)
    print("--- target valid ---")
    trainer.eval("valid_t", toprint=True)
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
