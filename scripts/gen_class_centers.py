#!/usr/bin/env python
"""Generate initial class-center files for MPSCL/SLCL.

The reference ships precomputed ``class_center_{ct|bssfp}_f{fold}.npy``
(shape (4, 32) float32; loaded at Trainer_MPSCL.py:306-331). This tool
produces them the way they are defined: per-class means of the source-domain
decoder features under a (source-trained or fresh) segmentor checkpoint.

Usage:
  python scripts/gen_class_centers.py method=baseline data.dataset=synthetic \
      run.restore_from=/path/ckpt_best out=class_center_ct_f0.npy
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from slcl_tpu.utils.jaxenv import configure_jax  # noqa: E402

configure_jax()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from slcl_tpu.config import Config, apply_recipe  # noqa: E402


def main(argv):
    out = next((a.split("=", 1)[1] for a in argv if a.startswith("out=")),
               "class_centers.npy")
    argv = [a for a in argv if not a.startswith("out=")]
    method = next((a.split("=", 1)[1] for a in argv if a.startswith("method=")),
                  "baseline")
    cfg = Config()
    cfg.method = method
    cfg = apply_recipe(cfg)  # presets change param-tree structure (phead!)
    cfg = Config.from_cli(argv, base=cfg)
    cfg.method = method

    from slcl_tpu.data.loader import Loader
    from slcl_tpu.ops.centroids import source_centroids
    from slcl_tpu.train.trainer import Trainer

    trainer = Trainer(cfg)
    if cfg.run.restore_from:
        trainer.restore_checkpoint(cfg.run.restore_from, params_only=True)
        print(f"restored '{cfg.run.restore_from}'")

    variables = {"params": trainer.state.seg.params}
    if trainer.state.seg.batch_stats:
        variables["batch_stats"] = trainer.state.seg.batch_stats
    model = trainer.model

    @jax.jit
    def feats_fn(variables, x):
        out = model.apply(variables, x, False)
        return out.dcdr_ft

    sums = jnp.zeros((cfg.model.num_classes, cfg.model.filters), jnp.float32)
    counts = jnp.zeros((cfg.model.num_classes, 1), jnp.float32)
    loader = Loader(trainer.datasets["train_s"], cfg.data.eval_bs,
                    shuffle=False, drop_last=False,
                    num_threads=cfg.data.num_workers)
    for img, mask, _names in loader:
        ft = feats_fn(variables, jnp.asarray(img))
        onehot = jax.nn.one_hot(jnp.asarray(mask).reshape(-1),
                                cfg.model.num_classes, dtype=jnp.float32)
        f = ft.astype(jnp.float32).reshape(-1, ft.shape[-1])
        sums = sums + onehot.T @ f
        counts = counts + jnp.sum(onehot, axis=0)[:, None]
    centers = np.asarray(sums / jnp.maximum(counts, 1.0), np.float32)
    np.save(out, centers)
    print(f"wrote {out} shape={centers.shape} norms="
          f"{np.linalg.norm(centers, axis=1).round(3).tolist()}")
    return centers


if __name__ == "__main__":
    main(sys.argv[1:])
