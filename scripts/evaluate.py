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

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from slcl_tpu.config import Config  # noqa: E402


def main(argv):
    method = next((a.split("=", 1)[1] for a in argv if a.startswith("method=")),
                  "baseline")
    cfg = Config()
    cfg.method = method
    cfg = Config.from_cli(argv, base=cfg)
    cfg.method = method

    from slcl_tpu.train.trainer import Trainer
    trainer = Trainer(cfg)
    tag = cfg.run.restore_from or "best"
    try:
        trainer.restore_checkpoint(tag)
        print(f"restored checkpoint '{tag}'")
    except Exception as e:
        print(f"no checkpoint restored ({e}); evaluating initial weights")
    print("--- target test ---")
    results = trainer.eval("test_t", toprint=True)
    print("--- target valid ---")
    trainer.eval("valid_t", toprint=True)
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
