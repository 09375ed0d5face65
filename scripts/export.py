#!/usr/bin/env python
"""Export a trained segmentor checkpoint to a portable serving artifact.

The artifact (``slcl_tpu.serve`` format: StableHLO via ``jax.export``, weights
baked in, symbolic batch dimension) runs under plain jax on CPU or TPU with no
slcl_tpu model code — the TPU-native replacement for the reference's
pickle-the-nn.Module deployment flow.

Usage:
  python scripts/export.py method=mccl run.restore_from=runs/.../ckpt_best \
      out=model.slclx
  python scripts/export.py method=slcl run.restore_from=... out=m.slclx \
      smoke=1        # also reload the artifact and check it against the live model

``out`` defaults to ``model.slclx``; ``smoke=1`` re-loads and verifies.
A missing ``run.restore_from`` exports the fresh initialization (useful only
for integration tests; a warning is printed).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from slcl_tpu.utils.jaxenv import configure_jax  # noqa: E402

configure_jax()


def main(argv):
    def pop(key, default):
        val = next((a.split("=", 1)[1] for a in argv
                    if a.startswith(key + "=")), default)
        return val, [a for a in argv if not a.startswith(key + "=")]

    out, argv = pop("out", "model.slclx")
    smoke, argv = pop("smoke", "0")
    method, _ = pop("method", "baseline")

    from slcl_tpu.config import Config, apply_recipe
    cfg = Config()
    cfg.method = method
    cfg = apply_recipe(cfg)  # presets change param-tree structure (phead!)
    cfg = Config.from_cli(argv, base=cfg)
    cfg.method = method

    import numpy as np

    from slcl_tpu import serve
    from slcl_tpu.data import SyntheticCardiacDataset as S
    from slcl_tpu.train.trainer import Trainer

    # tiny placeholder datasets: restore/export never reads data, and this
    # keeps the CLI usable when the training dataset is not on this machine
    n, crop = 2, cfg.data.crop
    tiny = {k: S(n, crop, "mr", i) for i, k in
            enumerate(("train_s", "train_t", "valid_t", "test_t"))}
    trainer = Trainer(cfg, datasets=tiny)
    if cfg.run.restore_from:
        trainer.restore_checkpoint(cfg.run.restore_from, params_only=True)
        print(f"restored '{cfg.run.restore_from}'")
    else:
        print("WARNING: no run.restore_from — exporting the fresh "
              "initialization (integration-test mode)")

    variables = {"params": trainer.state.seg.params}
    if trainer.state.seg.batch_stats:
        variables["batch_stats"] = trainer.state.seg.batch_stats
    exported = serve.export_segmentor(
        trainer.model, variables, crop=crop,
        in_channels=cfg.model.in_channels)
    meta = {"method": cfg.method, "backbone": cfg.model.backbone,
            "crop": crop, "num_classes": cfg.model.num_classes,
            "restored_from": str(cfg.run.restore_from or ""),
            "output": "int32 argmax label map (N, crop, crop)"}
    serve.save_artifact(out, exported, meta)
    size_mb = Path(out).stat().st_size / 1e6
    print(f"wrote {out} ({size_mb:.1f} MB, platforms "
          f"{list(exported.platforms)}, input {meta['crop']}x{meta['crop']})")

    if smoke not in ("0", "", "false"):
        import jax.numpy as jnp
        fn, meta2 = serve.load_artifact(out)
        x = np.random.default_rng(0).normal(
            size=(2, crop, crop, cfg.model.in_channels)).astype(np.float32)
        got = np.asarray(fn(jnp.asarray(x)))
        live = serve.make_infer_fn(trainer.model, variables)(jnp.asarray(x))
        assert got.shape == (2, crop, crop), got.shape
        assert (got == np.asarray(live)).mean() > 0.999, "artifact != live model"
        print(f"smoke ok: artifact matches the live model "
              f"(meta: {meta2['method']}/{meta2['backbone']})")
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
