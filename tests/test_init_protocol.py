"""SLCL init protocol + RAIN eps-clamp (round-3 features).

The reference's executed MPSCL recipe warm-starts the segmentor from a
pretrained checkpoint and seeds the EMA class centers from a center file
(Trainer_MPSCL.py:306-331). These tests cover the TPU build's equivalents:
``run.init_from`` (cross-method params-only warm start),
``contrastive.init_centers`` (center-file seeding, no first-step bootstrap
overwrite), and ``rain.eps_clip`` (bounded epsilon-ascent step — the round-3
repair for the per-seed RAIN+eps regressions, examples/README.md).
"""
import jax
import numpy as np
import pytest

from tests.test_trainer import tiny_cfg


def test_init_centers_missing_raises(tmp_path):
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path, method="mpscl")
    cfg.contrastive.init_centers = str(tmp_path / "nope.npy")
    with pytest.raises(FileNotFoundError, match="init_centers"):
        Trainer(cfg)


def test_init_centers_seed_ema_without_bootstrap(tmp_path):
    """Loaded centers enter the state verbatim and are EMA-updated, not
    replaced by the step-0 batch-mean bootstrap (steps.py gates bootstrap
    on centroids_loaded)."""
    from slcl_tpu.train.trainer import Trainer
    rng = np.random.default_rng(0)
    c0 = rng.normal(size=(4, 8)).astype(np.float32)  # filters=8 tiny model
    f = tmp_path / "centers.npy"
    np.save(f, c0)

    cfg = tiny_cfg(tmp_path / "a", method="mpscl", epochs=1)
    cfg.contrastive.init_centers = str(f)
    t = Trainer(cfg)
    np.testing.assert_array_equal(np.asarray(t.state.centroids), c0)
    t.train_epoch(0)
    after_loaded = np.asarray(t.state.centroids)
    assert not np.allclose(after_loaded, c0)  # EMA moved them

    # same run without init: the step-0 bootstrap adopts batch means, so the
    # trajectories must differ — proof the loaded centers were actually used
    cfg2 = tiny_cfg(tmp_path / "b", method="mpscl", epochs=1)
    t2 = Trainer(cfg2)
    assert np.all(np.asarray(t2.state.centroids) == 0)  # zero placeholder
    t2.train_epoch(0)
    after_boot = np.asarray(t2.state.centroids)
    assert not np.allclose(after_loaded, after_boot)
    # the EMA memory of c0 after k steps is m^k; with m=0.9 and the 8-step
    # tiny epoch the loaded run must still sit closer to c0 than the
    # bootstrap run does
    assert np.linalg.norm(after_loaded - c0) < np.linalg.norm(after_boot - c0)


def test_init_from_missing_raises(tmp_path):
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path, method="mpscl", epochs=1)
    cfg.run.init_from = str(tmp_path / "no_such_ckpt")
    t = Trainer(cfg)
    with pytest.raises(Exception):
        t.train()


def test_init_from_cross_method_warm_start(tmp_path):
    """A baseline checkpoint warm-starts an MPSCL trainer (params only):
    the executed form of the reference's pretrained-segmentor init."""
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path / "base", method="baseline", epochs=1)
    t = Trainer(cfg)
    t.train()
    ckpt = str(t.out_dir / "ckpt_last")

    cfg2 = tiny_cfg(tmp_path / "mpscl", method="mpscl", epochs=1)
    t2 = Trainer(cfg2)
    before = [np.asarray(x) for x in jax.tree.leaves(t2.state.seg.params)]
    t2.restore_checkpoint(ckpt, params_only=True)
    got = jax.tree.leaves(t2.state.seg.params)
    want = jax.tree.leaves(t.state.seg.params)
    assert any(not np.allclose(b, np.asarray(g))
               for b, g in zip(before, got))
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # discriminators stay fresh (baseline ckpt has none) and training runs
    m = t2.train_epoch(0)
    assert np.isfinite(m["seg_s"])


def test_init_from_merges_missing_phead(tmp_path):
    """Cross-method warm start into a model with extra heads: an AdvEnt/
    baseline checkpoint has no phead — restore must overlay the shared
    backbone and keep the fresh phead init (the MCCL preset's phead=True
    crashed here before the structured merge)."""
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path / "base", method="baseline", epochs=1)
    t = Trainer(cfg)
    t.train()
    ckpt = str(t.out_dir / "ckpt_last")

    cfg2 = tiny_cfg(tmp_path / "mccl", method="mccl", epochs=1)
    cfg2.model.phead = True
    cfg2.data.aug_counter = True
    cfg2.contrastive.wtd_ave = True
    t2 = Trainer(cfg2)
    fresh_phead = jax.tree.leaves(
        {k: v for k, v in t2.state.seg.params.items() if "phead" in k})
    t2.restore_checkpoint(ckpt, params_only=True)
    # shared backbone leaf equals the checkpoint
    a = np.asarray(jax.tree.leaves(t.state.seg.params)[0])
    b = np.asarray(jax.tree.leaves(
        {k: v for k, v in t2.state.seg.params.items() if "phead" not in k})[0])
    np.testing.assert_array_equal(a, b)
    # phead stayed at its fresh init
    after = jax.tree.leaves(
        {k: v for k, v in t2.state.seg.params.items() if "phead" in k})
    assert len(after) == len(fresh_phead) > 0
    for x, y in zip(fresh_phead, after):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    m = t2.train_epoch(0)
    assert np.isfinite(m["seg_s"])


def test_init_from_shape_mismatch_raises(tmp_path):
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path / "base", method="baseline", epochs=1)
    t = Trainer(cfg)
    t.train()
    cfg2 = tiny_cfg(tmp_path / "wide", method="baseline", epochs=1)
    cfg2.model.filters = 16  # different widths: must not silently misload
    t2 = Trainer(cfg2)
    with pytest.raises(ValueError, match="shape"):
        t2.restore_checkpoint(str(t.out_dir / "ckpt_last"), params_only=True)


def test_init_eval_seeds_best_selection(tmp_path):
    """With run.init_from, the warm start is evaluated BEFORE training
    (epoch -1) and seeds the best-checkpoint selection: a fine-tune that
    never beats its init ships the init instead of a degraded model."""
    import json
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path / "base", method="baseline", epochs=1)
    t = Trainer(cfg)
    t.train()

    cfg2 = tiny_cfg(tmp_path / "ft", method="mpscl", epochs=1)
    cfg2.run.init_from = str(t.out_dir / "ckpt_last")
    cfg2.optim.lr = 1e-12  # continuation cannot improve on the init
    t2 = Trainer(cfg2)
    summary = t2.train()
    lines = [json.loads(l) for l in open(t2.out_dir / "log.jsonl")]
    assert lines[0]["epoch"] == -1 and "val_dice" in lines[0]
    assert (t2.out_dir / "ckpt_best").exists()
    assert summary["best_val_dice"] >= lines[0]["val_dice"]


def test_lr_warmup_scales_schedule(tmp_path):
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path, method="baseline", epochs=8)
    cfg.optim.lr_warmup_epochs = 4
    t = Trainer(cfg)
    cfg_ref = tiny_cfg(tmp_path / "ref", method="baseline", epochs=8)
    t_ref = Trainer(cfg_ref)
    for e in range(8):
        lr = float(t._sched(e)["lr"])
        base = float(t_ref._sched(e)["lr"])
        want = base * min(1.0, (e + 1) / 4)
        assert lr == pytest.approx(want, rel=1e-6), (e, lr, want)


def test_rain_eps_clip_bounds_step(tmp_path):
    """rain.eps_clip caps the per-iteration epsilon-ascent L2 step; the
    logged eps_step_norm (epoch mean of per-step norms) must respect it."""
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path / "pre", method="pretrain_rain", epochs=1)
    t = Trainer(cfg)
    ckpts = t.train()["component_ckpts"]

    def rain_cfg(path, clip):
        c = tiny_cfg(path, method="mccl", epochs=1)
        c.rain.enabled = True
        c.rain.update_eps = True
        c.rain.eps_clip = clip
        c.rain.vgg_ckpt = ckpts["encoder"]
        c.rain.decoder_ckpt = ckpts["decoder"]
        c.rain.fc_encoder_ckpt = ckpts["fc_encoder"]
        c.rain.fc_decoder_ckpt = ckpts["fc_decoder"]
        return c

    clip = 0.05
    t1 = Trainer(rain_cfg(tmp_path / "clip", clip))
    m1 = t1.train_epoch(0)
    assert 0.0 < float(m1["eps_step_norm"]) <= clip + 1e-5
    # unclamped (reference-exact) control on the same pretrain: the raw
    # (lr_eps/loss)*grad step is far larger than the clamp on tiny models
    t0 = Trainer(rain_cfg(tmp_path / "noclip", 0.0))
    m0 = t0.train_epoch(0)
    assert float(m0["eps_step_norm"]) > float(m1["eps_step_norm"])


def test_rain_style_alpha_blend_and_consistency(tmp_path):
    """rain.style_alpha blends the stylized branch toward the source
    content: img_style <- alpha*stylized + (1-alpha)*img_s (steps.py mccl
    rain branch). At alpha=0 the stylized row IS the source row, so the
    style-shift diagnostic (style_hist_d) and the bottleneck-consistency
    MSE both collapse to exactly 0 (identical rows through shared BN
    stats); alpha=0.5 must sit strictly between that and the
    reference-exact alpha=1 on both — the knob softens the style shift
    AND shrinks the stylized-vs-source gap the consistency loss measures,
    proportionally, instead of disabling the branch."""
    from slcl_tpu.train.trainer import Trainer
    cfg = tiny_cfg(tmp_path / "pre", method="pretrain_rain", epochs=1)
    ckpts = Trainer(cfg).train()["component_ckpts"]

    def run(alpha, path):
        c = tiny_cfg(path, method="mccl", epochs=1)
        c.rain.enabled = True
        c.rain.style_alpha = alpha
        c.rain.vgg_ckpt = ckpts["encoder"]
        c.rain.decoder_ckpt = ckpts["decoder"]
        c.rain.fc_encoder_ckpt = ckpts["fc_encoder"]
        c.rain.fc_decoder_ckpt = ckpts["fc_decoder"]
        m = Trainer(c).train_epoch(0)
        return float(m["style_hist_d"]), float(m["loss_consist"])

    h0, c0 = run(0.0, tmp_path / "a0")
    h5, c5 = run(0.5, tmp_path / "a5")
    h1, c1 = run(1.0, tmp_path / "a1")
    assert h0 == pytest.approx(0.0, abs=1e-6)
    assert c0 == pytest.approx(0.0, abs=1e-8)
    assert h0 < h5 < h1, (h0, h5, h1)
    assert c0 < c5 < c1, (c0, c5, c1)


def test_clip_step_norm_sanitizes_nonfinite():
    """The clamp must stay finite when the unbounded ascent step overflows:
    naive v*min(1, clip/||v||) gives inf*0=NaN exactly in the blow-up
    regime the clamp exists for."""
    import jax.numpy as jnp

    from slcl_tpu.train.steps import clip_step_norm

    v = jnp.array([jnp.inf, 1.0, -jnp.nan, 2.0])
    out = np.asarray(clip_step_norm(v, 3.0))
    assert np.all(np.isfinite(out))
    assert np.linalg.norm(out) <= 3.0 + 1e-5
    # finite input at norm<=clip passes through unchanged
    w = jnp.array([0.3, -0.4])
    np.testing.assert_allclose(np.asarray(clip_step_norm(w, 3.0)),
                               np.asarray(w), rtol=1e-6)
    # finite input above the clip is scaled onto the ball
    big = jnp.array([30.0, 40.0])
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(clip_step_norm(big, 3.0))), 3.0, rtol=1e-5)


def test_no_periodic_ckpt_for_init_eval(tmp_path):
    """mcp.step(dice, -1) (the pre-training warm-start eval) must not
    trigger the periodic e{N} save: (−1+1) % N == 0 for every N."""
    from slcl_tpu.utils.callbacks import ModelCheckPointCallback

    saved = []
    mcp = ModelCheckPointCallback(str(tmp_path), saved.append,
                                  save_every_epochs=5, n_epochs=10)
    assert not mcp.wrote_best
    mcp.step(0.5, -1)
    assert saved == ["best", "last"]  # no spurious "e0"
    assert mcp.wrote_best
    mcp.step(0.6, 4)
    assert saved[-3:] == ["best", "last", "e5"]


def test_final_test_ignores_stale_best(tmp_path, capsys):
    """A ckpt_best left in a reused out_dir by a PREVIOUS run must not be
    restored for the final test when THIS run never wrote a best."""
    from slcl_tpu.train.trainer import Trainer

    cfg = tiny_cfg(tmp_path, method="baseline", epochs=1)
    t = Trainer(cfg)
    t.train()
    first = np.asarray(jax.tree.leaves(t.state.seg.params)[0]).copy()

    # second run in the SAME out_dir that never evals (epochs=0; the same
    # state arises from all-NaN val dice) -> never writes a best
    cfg2 = tiny_cfg(tmp_path, method="baseline", epochs=0)
    t2 = Trainer(cfg2)
    t2.train()
    out = capsys.readouterr().out
    assert "stale ckpt_best" in out
    # final state is this run's own weights, not the previous run's best
    second = np.asarray(jax.tree.leaves(t2.state.seg.params)[0])
    assert not np.array_equal(first, second)
