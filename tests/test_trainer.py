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


def test_ctor_does_not_litter_run_dirs(tmp_path):
    """Eval-only Trainer consumers (gen_class_centers/export/evaluate) must
    not create empty run dirs; train() creates out_dir lazily."""
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path, epochs=1)
    t = Trainer(cfg)
    assert not t.out_dir.exists()
    t.train()
    assert (t.out_dir / "log.jsonl").exists()


def test_profile_dir_writes_trace(tmp_path):
    """run.profile_dir wraps one epoch in a jax.profiler trace (the TPU
    replacement for the reference's print-only @timer.timeit, SURVEY §5)."""
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path)
    cfg.run.profile_dir = str(tmp_path / "prof")
    cfg.run.profile_epoch = 1
    Trainer(cfg).train()
    traces = list((tmp_path / "prof").rglob("*.xplane.pb"))
    assert traces, "no xplane trace written under run.profile_dir"


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


def test_trainer_fsdp_spatial_mesh(tmp_path):
    """mesh.model_axis=2 + mesh.fsdp + mesh.spatial: the Trainer shards
    params over 'model' and image rows over 'model' (sp) and still trains
    end-to-end on the 8-virtual-device CPU setup."""
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path, method="mpscl", epochs=1)
    cfg.data.bs = 4   # data axis = 8/2 = 4 devices
    cfg.mesh.model_axis = 2
    cfg.mesh.fsdp = True
    cfg.mesh.fsdp_min_size = 256  # tiny test model: shard small leaves too
    cfg.mesh.spatial = True
    t = Trainer(cfg)
    assert t.mesh is not None and dict(t.mesh.shape) == {"data": 4,
                                                         "model": 2}
    # fsdp actually sharded at least one leaf over 'model'
    sharded = [x for x in jax.tree.leaves(t.state.seg.params)
               if hasattr(x, "sharding") and "model" in (x.sharding.spec or ())]
    assert sharded, "expected fsdp-sharded parameter leaves"
    metrics = t.train_epoch(0)
    assert all(np.isfinite(v) for v in metrics.values())


def test_pretrain_rain_exports_component_ckpts_and_rain_loads_them(tmp_path):
    """pretrain_rain -> 4 component npz ckpts -> rain seg training loads them
    (the reference pretrain->RAIN pipeline, Pretrainer_RAIN + load_rain_models)."""
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path, method="pretrain_rain", epochs=1)
    cfg.data.bs = 2
    t = Trainer(cfg)
    summary = t.train()
    ckpts = summary["component_ckpts"]
    for name, p in ckpts.items():
        assert json.loads(json.dumps(p))  # path strings
        import os
        assert os.path.exists(p), p

    cfg2 = tiny_cfg(tmp_path, method="rain", epochs=1)
    cfg2.rain.enabled = True
    cfg2.rain.vgg_ckpt = ckpts["encoder"]
    cfg2.rain.decoder_ckpt = ckpts["decoder"]
    cfg2.rain.fc_encoder_ckpt = ckpts["fc_encoder"]
    cfg2.rain.fc_decoder_ckpt = ckpts["fc_decoder"]
    t2 = Trainer(cfg2)
    # the loaded encoder params equal the pretrained ones
    from slcl_tpu.utils.torch_convert import load_tree_npz
    want = load_tree_npz(ckpts["encoder"])["params"]
    got = t2.state.extra["rain"]["encoder"]
    a = np.asarray(jax.tree.leaves(want)[0])
    b = np.asarray(jax.tree.leaves(got)[0])
    np.testing.assert_allclose(a, b, rtol=1e-6)
    metrics = t2.train_epoch(0)
    assert np.isfinite(metrics["seg"])


def test_scan_steps_matches_single_step(tmp_path):
    """run.scan_steps=2 (K steps per dispatch via lax.scan, including an odd
    tail batch through the plain step) reproduces the scan_steps=1 epoch
    exactly — same data order, same final params and state."""
    from slcl_tpu.train.trainer import Trainer
    cfg1 = tiny_cfg(tmp_path / "a", method="mpscl", epochs=1)
    t1 = Trainer(cfg1)
    m1 = t1.train_epoch(0)

    cfg2 = tiny_cfg(tmp_path / "b", method="mpscl", epochs=1)
    cfg2.run.scan_steps = 2
    t2 = Trainer(cfg2)
    m2 = t2.train_epoch(0)

    # synthetic train split is 8*bs samples = 8 steps; K=3 forces a 2-batch
    # tail through the plain step (8 = 3 + 3 + 2)
    cfg3 = tiny_cfg(tmp_path / "c", method="mpscl", epochs=1)
    cfg3.run.scan_steps = 3
    t3 = Trainer(cfg3)
    m3 = t3.train_epoch(0)

    for ta, tb in ((t1, t2), (t1, t3)):
        a = jax.tree.leaves(ta.state.seg.params)
        b = jax.tree.leaves(tb.state.seg.params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ta.state.centroids),
                                   np.asarray(tb.state.centroids),
                                   rtol=2e-5, atol=1e-6)
        assert int(ta.state.step) == int(tb.state.step)
    for k in m1:
        if k.startswith("dis_acc"):
            # log-only thresholded pixel counts on a near-chance untrained
            # discriminator: tiny logit differences between the scan-compiled
            # and plain-compiled XLA programs flip individual pixels, so the
            # counts are not comparable at tight tolerance (the params /
            # centroids equality above is the real parity statement)
            continue
        assert float(m1[k]) == pytest.approx(float(m2[k]),
                                             rel=1e-4, abs=1e-6), k
        assert float(m1[k]) == pytest.approx(float(m3[k]),
                                             rel=1e-4, abs=1e-6), k


def test_fast_val_matches_host_dice(tmp_path):
    """On-device dice (fast_val) equals the host path with klc off."""
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path, epochs=1)
    cfg.run.klc = False
    t = Trainer(cfg)
    host = t.eval("valid_t", ifhd=False, ifasd=False)
    fast = t.eval("valid_t", fast=True)
    np.testing.assert_allclose(fast["dc"][0::2], host["dc"][0::2], atol=1e-6)


def test_missing_rain_ckpt_raises(tmp_path):
    """A configured-but-absent rain checkpoint must fail loudly, not fall
    back to a random-init RAIN net (which silently invalidates the run)."""
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path, method="mccl")
    cfg.rain.enabled = True
    cfg.rain.vgg_ckpt = str(tmp_path / "nonexistent.npz")
    with pytest.raises(FileNotFoundError, match="rain.encoder"):
        Trainer(cfg)


def test_params_only_restore_across_optimizers(tmp_path):
    """Eval/serving restore must not depend on the training optimizer:
    a checkpoint saved from an adam run restores into an sgd-configured
    trainer with params_only=True (scripts/evaluate.py path)."""
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path, epochs=1)
    cfg.optim.optimizer = "adam"
    t = Trainer(cfg)
    t.train()
    p_trained = np.asarray(jax.tree.leaves(t.state.seg.params)[0])

    cfg2 = tiny_cfg(tmp_path, epochs=1)
    cfg2.optim.optimizer = "sgd"  # different opt-state structure
    t2 = Trainer(cfg2)
    t2.out_dir = t.out_dir
    t2.restore_checkpoint("last", params_only=True)
    p_restored = np.asarray(jax.tree.leaves(t2.state.seg.params)[0])
    np.testing.assert_array_equal(p_trained, p_restored)


def test_evalT_logs_test_dice(tmp_path):
    """run.evalT also evaluates the test split each eval epoch
    (reference -evalT, Trainer.py:44)."""
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path, epochs=1)
    cfg.run.evalT = True
    t = Trainer(cfg)
    t.train()
    rec = t.history[-1]
    assert "val_dice" in rec and "test_dice" in rec


def test_stylized_branch_trigger_detection():
    """The round-5 collapse signature (examples/README.md 'Round-5 root
    cause'): a stylized-branch class dice pinned ~0 over the early epochs
    while the source branch saturates must warn; a late recovery, a
    not-yet-saturated source branch (the style_alpha=0.5 pattern), or a
    run without RAIN diagnostics must not."""
    from slcl_tpu.train.trainer import stylized_branch_triggers

    def hist(style_c3, src_c3):
        return [{"epoch": e,
                 "dice_style_c1": 0.5, "dice_style_c2": 0.5,
                 "dice_style_c3": style_c3[e],
                 "dice_src_c1": 0.9, "dice_src_c2": 0.9,
                 "dice_src_c3": src_c3[e]} for e in range(6)]

    # mcclrain_epsclip_s13 pattern: style c3 ~0, source saturates -> fires
    bad = hist([0.02, 0.003, 0.0, 0.0, 0.0, 0.0],
               [0.06, 0.12, 0.49, 0.75, 0.83, 0.86])
    ws = stylized_branch_triggers(bad)
    assert len(ws) == 1 and "dice_style_c3" in ws[0]

    # healthy (mcclrain_epsclip_s0 pattern): style c3 learnable -> silent
    good = hist([0.06, 0.14, 0.44, 0.25, 0.22, 0.42],
                [0.07, 0.28, 0.27, 0.20, 0.34, 0.66])
    assert stylized_branch_triggers(good) == []

    # mcclrain_alpha_s13 pattern: style c3 pinned early but the source
    # branch has not saturated either -> silent (run recovered to 0.727)
    alpha = hist([0.03, 0.0, 0.0, 0.0, 0.02, 0.27],
                 [0.12, 0.27, 0.55, 0.51, 0.50, 0.61])
    assert stylized_branch_triggers(alpha) == []

    # plain MCCL (no RAIN diagnostics logged) -> silent
    plain = [{"epoch": e, "val_dice": 0.5} for e in range(6)]
    assert stylized_branch_triggers(plain) == []

    # incomplete early window (run just started) -> silent
    assert stylized_branch_triggers(bad[:3]) == []
