"""Train-step smoke + semantics tests for every method (tiny shapes, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slcl_tpu.config import Config
from slcl_tpu.models import UncertaintyDiscriminator, build_segmentor
from slcl_tpu.train.state import create_train_state
from slcl_tpu.train.steps import build_step

H = W = 32


def tiny_cfg(method, multilvl=False, **contrastive):
    cfg = Config()
    cfg.method = method
    cfg.data.crop = H
    cfg.data.bs = 2
    cfg.model.backbone = "drunet"
    cfg.model.filters = 8
    cfg.model.n_block = 3
    cfg.model.bottleneck_depth = 2
    cfg.model.multilvl = multilvl
    cfg.model.dtype = "float32"
    for k, v in contrastive.items():
        setattr(cfg.contrastive, k, v)
    return cfg


def make_batch(rng, method):
    batch = {
        "img_s": jnp.asarray(rng.normal(size=(2, H, W, 3)).astype(np.float32)),
        "lab_s": jnp.asarray(rng.integers(0, 4, size=(2, H, W)).astype(np.int32)),
        "img_t": jnp.asarray(rng.normal(size=(2, H, W, 3)).astype(np.float32)),
    }
    if method == "mccl":
        batch["img_t_aug"] = jnp.asarray(
            rng.normal(size=(2, H, W, 3)).astype(np.float32))
    return batch


def build(cfg):
    model = build_segmentor(cfg.model)
    disc = disc_aux = None
    if cfg.method in ("adaptseg", "advent", "mpscl", "slcl"):
        disc = UncertaintyDiscriminator(dtype=jnp.float32)
        if cfg.model.multilvl:
            disc_aux = UncertaintyDiscriminator(dtype=jnp.float32)
    cents = None
    if cfg.method in ("mpscl", "slcl"):
        cents = jnp.asarray(np.random.default_rng(0).normal(
            size=(4, cfg.model.filters)).astype(np.float32))
    state, txs = create_train_state(
        cfg, model, disc=disc, disc_aux=disc_aux,
        sample_shape=(1, H, W, 3), centroids=cents)
    step = build_step(cfg, model, txs, disc, disc_aux)
    return state, step


def sched(lr=1e-3, warm=1.0):
    return {"lr": jnp.asarray(lr), "lr_dis": jnp.asarray(1e-4),
            "warm": jnp.asarray(warm)}


@pytest.mark.parametrize("method", ["baseline", "adaptseg", "advent", "mpscl", "mccl"])
def test_step_runs_and_updates(method, rng):
    cfg = tiny_cfg(method, part=2 if method == "mccl" else 1,
                   wtd_ave=(method == "mccl"), CNR=(method != "baseline"),
                   CNR_w=4e-5)
    state, step = build(cfg)
    batch = make_batch(rng, method)
    p0 = jax.tree.leaves(state.seg.params)[0].copy()
    state2, metrics = step(state, batch, sched())
    assert int(state2.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    p1 = jax.tree.leaves(state2.seg.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1)), "params must update"
    # second call must not retrace-crash and must advance
    state3, _ = step(state2, batch, sched(lr=5e-4))
    assert int(state3.step) == 2


def test_adversarial_updates_discriminator(rng):
    cfg = tiny_cfg("advent")
    state, step = build(cfg)
    batch = make_batch(rng, "advent")
    d0 = jax.tree.leaves(state.d_main.params)[0].copy()
    state2, metrics = step(state, batch, sched())
    d1 = jax.tree.leaves(state2.d_main.params)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    assert 0.0 <= float(metrics["dis_acc_s"]) <= 1.0
    assert 0.0 <= float(metrics["dis_acc_t"]) <= 1.0


def test_mpscl_centroids_evolve(rng):
    cfg = tiny_cfg("mpscl")
    state, step = build(cfg)
    batch = make_batch(rng, "mpscl")
    c0 = np.asarray(state.centroids)
    state2, metrics = step(state, batch, sched())
    c1 = np.asarray(state2.centroids)
    assert not np.allclose(c0, c1), "EMA centers must move"
    assert np.isfinite(float(metrics["loss_mpscl_tr"]))
    assert np.isfinite(float(metrics["loss_mpscl_tg"]))


def test_mccl_warmup_gates_contrastive(rng):
    cfg = tiny_cfg("mccl", part=2, wtd_ave=True, clda=True, CNR=True,
                   CNR_w=1.0, warmup_epochs=5)
    state, step = build(cfg)
    batch = make_batch(rng, "mccl")
    # steps donate their input state; copy before reusing the same state
    state_copy = jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x,
                              state)
    # warm=0: contrastive/CNR reported but not applied; params still update
    # from the seg loss. warm=1 must change the resulting params.
    s_cold, m_cold = step(state, batch, sched(warm=0.0))
    s_warm, m_warm = step(state_copy, batch, sched(warm=1.0))
    assert np.isfinite(float(m_cold["inter_c_loss"]))
    p_cold = np.asarray(jax.tree.leaves(s_cold.seg.params)[0])
    p_warm = np.asarray(jax.tree.leaves(s_warm.seg.params)[0])
    assert not np.allclose(p_cold, p_warm)


def test_multilvl_aux_discriminator(rng):
    cfg = tiny_cfg("mpscl", multilvl=True)
    state, step = build(cfg)
    batch = make_batch(rng, "mpscl")
    assert state.d_aux is not None
    da0 = np.asarray(jax.tree.leaves(state.d_aux.params)[0])  # before donation
    state2, metrics = step(state, batch, sched())
    assert "loss_dis_aux" in metrics
    da1 = jax.tree.leaves(state2.d_aux.params)[0]
    assert not np.allclose(da0, np.asarray(da1))


def test_baseline_train_with_t(rng):
    """train_with_t (supervised-target oracle) trains on the target batch
    (reference Trainer_baseline.py:34-37, :221-227)."""
    cfg = tiny_cfg("baseline")
    cfg.data.train_with_s = False
    cfg.data.train_with_t = True
    state, step = build(cfg)
    batch = make_batch(rng, "baseline")
    batch["lab_t"] = jnp.asarray(
        rng.integers(0, 4, size=(2, H, W)).astype(np.int32))
    state2, metrics = step(state, batch, sched())
    assert "seg_t" in metrics and np.isfinite(float(metrics["seg_t"]))
    assert int(state2.step) == 1


def test_w_seg_aux_scales_aux_loss(rng):
    """adv.w_seg_aux weights the multilvl aux seg loss (Trainer_AdaptSeg.py:160)."""
    params = {}
    for w in (0.0, 10.0):
        cfg = tiny_cfg("baseline", )
        cfg.model.multilvl = True
        cfg.adv.w_seg_aux = w
        state, step = build(cfg)
        batch = make_batch(rng, "baseline")
        s2, m = step(state, batch, sched())
        assert "seg_s_aux" in m
        params[w] = np.asarray(jax.tree.leaves(s2.seg.params)[0])
    assert not np.allclose(params[0.0], params[10.0])
