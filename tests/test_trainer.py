"""Trainer orchestration: full loop, checkpoint save/restore/resume (CPU)."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slcl_tpu.config import Config


def tiny_cfg(tmp_path, method="baseline", epochs=2):
    cfg = Config()
    cfg.method = method
    cfg.data.dataset = "synthetic"
    cfg.data.bs = 2
    cfg.data.crop = 32
    cfg.data.eval_bs = 4
    cfg.data.num_workers = 1
    cfg.model.filters = 8
    cfg.model.n_block = 2
    cfg.model.bottleneck_depth = 2
    cfg.model.dtype = "float32"
    cfg.optim.epochs = epochs
    cfg.run.eval_frequency = 1
    cfg.run.out_dir = str(tmp_path)
    return cfg


def test_trainer_full_loop_and_logs(tmp_path):
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path)
    t = Trainer(cfg)
    summary = t.train()
    assert "best_val_dice" in summary
    out = t.out_dir
    lines = [json.loads(l) for l in open(out / "log.jsonl")]
    assert len(lines) == 2
    assert "seg_s" in lines[0] and "val_dice" in lines[0]
    assert (out / "summary.json").exists()
    assert (out / "ckpt_last").exists()


def test_checkpoint_restore_roundtrip(tmp_path):
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path, epochs=1)
    t = Trainer(cfg)
    t.train()
    p_trained = np.asarray(jax.tree.leaves(t.state.seg.params)[0])

    # fresh trainer, restore from the saved checkpoint
    cfg2 = tiny_cfg(tmp_path, epochs=1)
    t2 = Trainer(cfg2)
    p_fresh = np.asarray(jax.tree.leaves(t2.state.seg.params)[0])
    assert not np.allclose(p_trained, p_fresh)
    t2.restore_checkpoint("last")
    p_restored = np.asarray(jax.tree.leaves(t2.state.seg.params)[0])
    np.testing.assert_array_equal(p_trained, p_restored)
    # step counter restored too
    assert int(t2.state.step) == int(t.state.step)


def test_resume_via_restore_from(tmp_path):
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path, epochs=1)
    t = Trainer(cfg)
    t.train()
    steps_after_first = int(t.state.step)

    cfg2 = tiny_cfg(tmp_path, epochs=1)
    cfg2.run.restore_from = "last"
    t2 = Trainer(cfg2)
    t2.train()
    assert int(t2.state.step) == 2 * steps_after_first


def test_trainer_multidevice_mesh(tmp_path):
    """On the 8-virtual-device CPU setup, the Trainer must pick up the mesh
    and train data-parallel end-to-end."""
    import jax
    assert len(jax.devices()) == 8
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path, method="mpscl", epochs=1)
    cfg.data.bs = 8  # divisible by 8 devices
    t = Trainer(cfg)
    assert t.mesh is not None
    summary = t.train()
    assert "best_val_dice" in summary
    # state stayed replicated and finite through the epoch
    leaf = jax.tree.leaves(t.state.seg.params)[0]
    assert bool(jnp.isfinite(leaf).all())
