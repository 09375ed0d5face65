"""Data-parallel mesh: sharded-batch training equals single-device training
(8 virtual CPU devices from conftest)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from slcl_tpu.config import Config
from slcl_tpu.models import UncertaintyDiscriminator, build_segmentor
from slcl_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from slcl_tpu.train.state import create_train_state
from slcl_tpu.train.steps import build_step

H = 16


def _setup(method="mpscl"):
    cfg = Config()
    cfg.method = method
    cfg.model.filters = 8
    cfg.model.n_block = 2
    cfg.model.bottleneck_depth = 2
    cfg.model.dtype = "float32"
    model = build_segmentor(cfg.model)
    disc = UncertaintyDiscriminator(dtype=jnp.float32)
    cents = jnp.zeros((4, 8), jnp.float32)
    state, txs = create_train_state(cfg, model, disc=disc,
                                    sample_shape=(1, H, H, 3), centroids=cents)
    step = build_step(cfg, model, txs, disc, None)
    return cfg, state, step


def _batch(rng, B=8):
    return {
        "img_s": rng.normal(size=(B, H, H, 3)).astype(np.float32),
        "lab_s": rng.integers(0, 4, size=(B, H, H)).astype(np.int32),
        "img_t": rng.normal(size=(B, H, H, 3)).astype(np.float32),
    }


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_step_matches_single_device(rng):
    """The same batch, sharded 8-way vs on one device, must produce the
    same updated parameters (bit-level up to reduction order)."""
    _, state, step = _setup()
    batch_np = _batch(rng)
    sched = {"lr": jnp.asarray(1e-3), "lr_dis": jnp.asarray(1e-4),
             "warm": jnp.asarray(1.0)}

    # single device
    single = {k: jnp.asarray(v) for k, v in batch_np.items()}
    s1, m1 = step(state, single, sched)

    # 8-way data parallel
    mesh = make_mesh()
    with mesh:
        state_r = replicate_state(state, mesh)
        sharded = shard_batch(batch_np, mesh)
        s8, m8 = step(state_r, sharded, sched)

    p1 = np.asarray(jax.tree.leaves(s1.seg.params)[0])
    p8 = np.asarray(jax.tree.leaves(s8.seg.params)[0])
    np.testing.assert_allclose(p1, p8, rtol=1e-4, atol=1e-6)
    assert float(m1["seg_s"]) == pytest.approx(float(m8["seg_s"]), rel=1e-5)
    c1 = np.asarray(s1.centroids)
    c8 = np.asarray(s8.centroids)
    np.testing.assert_allclose(c1, c8, rtol=1e-4, atol=1e-6)


def test_graft_entry_single_chip():
    import __graft_entry__ as g
    fn, (variables, x) = g.entry()
    out = jax.jit(fn)(variables, x)
    assert out.shape == (2, 224, 224, 4)


def test_fsdp_sharding_matches_replicated(rng):
    """Params sharded over the model axis must produce the same step result
    as fully-replicated params (GSPMD inserts the collectives)."""
    from slcl_tpu.parallel.mesh import fsdp_shard_state
    _, state, step = _setup()
    batch_np = _batch(rng)
    sched = {"lr": jnp.asarray(1e-3), "lr_dis": jnp.asarray(1e-4),
             "warm": jnp.asarray(1.0)}
    mesh = make_mesh(8, model_axis=4)  # 2 data x 4 model
    with mesh:
        state_r = replicate_state(state, mesh)
        s_ref, m_ref = step(state_r, shard_batch(batch_np, mesh), sched)

        state_f = fsdp_shard_state(state, mesh, min_size=1024)
        # at least one leaf actually sharded over 'model'
        sharded_leaves = [x for x in jax.tree.leaves(state_f)
                          if hasattr(x, "sharding")
                          and "model" in (x.sharding.spec or ())]
        assert sharded_leaves, "expected some fsdp-sharded leaves"
        s_f, m_f = step(state_f, shard_batch(batch_np, mesh), sched)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s_ref.seg.params)[0]),
        np.asarray(jax.tree.leaves(s_f.seg.params)[0]), rtol=1e-4, atol=1e-6)
    assert float(m_ref["seg_s"]) == pytest.approx(float(m_f["seg_s"]), rel=1e-5)


def test_spatial_partitioning_matches_single_device(rng):
    """SP: batch sharded over 'data' AND image rows sharded over 'model'
    (GSPMD halo exchange through the conv stages) must reproduce the
    single-device step."""
    from slcl_tpu.parallel.mesh import spatial_shard_batch
    _, state, step = _setup()
    batch_np = _batch(rng)
    sched = {"lr": jnp.asarray(1e-3), "lr_dis": jnp.asarray(1e-4),
             "warm": jnp.asarray(1.0)}
    single = {k: jnp.asarray(v) for k, v in batch_np.items()}
    s1, m1 = step(state, single, sched)

    mesh = make_mesh(8, model_axis=4)  # 2 data x 4 model; H=16 -> 4 rows/dev
    with mesh:
        state_r = replicate_state(state, mesh)
        sp = spatial_shard_batch(batch_np, mesh)
        # images really are row-sharded over 'model'
        assert any("model" in (v.sharding.spec or ()) for v in sp.values())
        s2, m2 = step(state_r, sp, sched)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s1.seg.params)[0]),
        np.asarray(jax.tree.leaves(s2.seg.params)[0]), rtol=1e-4, atol=1e-6)
    assert float(m1["seg_s"]) == pytest.approx(float(m2["seg_s"]), rel=1e-5)


def test_mccl_sharded_step_matches_single_device(rng):
    """MCCL's rMC partition RNG runs inside jit from state.rng: the random
    pixel->partition assignment (and therefore the whole step) must be
    invariant to how the batch is sharded (VERDICT round-1 item 9)."""
    cfg = Config()
    cfg.method = "mccl"
    cfg.model.filters = 8
    cfg.model.n_block = 2
    cfg.model.bottleneck_depth = 2
    cfg.model.dtype = "float32"
    cfg.contrastive.part = 2
    cfg.contrastive.wtd_ave = True
    cfg.contrastive.CNR = True
    model = build_segmentor(cfg.model)
    cents = jnp.zeros((4, 8), jnp.float32)
    state, txs = create_train_state(cfg, model, sample_shape=(1, H, H, 3),
                                    centroids=cents)
    step = build_step(cfg, model, txs)
    B = 8
    batch_np = {
        "img_s": rng.normal(size=(B, H, H, 3)).astype(np.float32),
        "lab_s": rng.integers(0, 4, size=(B, H, H)).astype(np.int32),
        "img_t": rng.normal(size=(B, H, H, 3)).astype(np.float32),
        "img_t_aug": rng.normal(size=(B, H, H, 3)).astype(np.float32),
    }
    sched = {"lr": jnp.asarray(1e-3), "lr_dis": jnp.asarray(1e-4),
             "warm": jnp.asarray(1.0), "fresh": jnp.asarray(1.0),
             "eps_on": jnp.asarray(0.0)}
    single = {k: jnp.asarray(v) for k, v in batch_np.items()}
    s1, m1 = step(state, single, sched)
    mesh = make_mesh()
    with mesh:
        state_r = replicate_state(state, mesh)
        s8, m8 = step(state_r, shard_batch(batch_np, mesh), sched)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s1.seg.params)[0]),
        np.asarray(jax.tree.leaves(s8.seg.params)[0]), rtol=1e-4, atol=1e-6)
    for k in ("seg_s", "inter_c_loss", "CNR", "ratio_t"):
        assert float(m1[k]) == pytest.approx(float(m8[k]), rel=1e-4), k
    np.testing.assert_allclose(np.asarray(s1.centroids),
                               np.asarray(s8.centroids), rtol=1e-4, atol=1e-6)


def test_mccl_rain_sharded_step_matches_single_device(rng):
    """The headline co-train recipe under the mesh (VERDICT r3 #3a): MCCL
    with rain.enabled — RAIN stylization, the carried ``state.sampling``
    vector and the one-forward/two-cotangent vjp epsilon ascent (reference
    Trainer_MCCL.py:196-244,349-351) must be invariant to batch sharding:
    updated params, the updated sampling AND the eps step norm must match
    the single-device step."""
    from slcl_tpu.models.rain import RAIN
    cfg = Config()
    cfg.method = "mccl"
    cfg.model.filters = 8
    cfg.model.n_block = 2
    cfg.model.bottleneck_depth = 2
    cfg.model.dtype = "float32"
    cfg.contrastive.part = 2
    cfg.contrastive.wtd_ave = True
    cfg.contrastive.CNR = True
    cfg.rain.enabled = True
    cfg.rain.update_eps = True
    cfg.rain.eps_clip = 3.0
    model = build_segmentor(cfg.model)
    rain = RAIN()
    x0 = jnp.zeros((1, H, H, 3), jnp.float32)
    rv = rain.init({"params": jax.random.PRNGKey(7),
                    "noise": jax.random.PRNGKey(8)}, x0, x0)
    cents = jnp.zeros((4, 8), jnp.float32)
    state, txs = create_train_state(cfg, model, sample_shape=(1, H, H, 3),
                                    centroids=cents)
    state = state.replace(extra={"rain": rv["params"]},
                          sampling=jnp.zeros((1, 512), jnp.float32))
    step = build_step(cfg, model, txs, rain_model=rain)
    B = 8
    batch_np = {
        "img_s": rng.normal(size=(B, H, H, 3)).astype(np.float32),
        "lab_s": rng.integers(0, 4, size=(B, H, H)).astype(np.int32),
        "img_t": rng.normal(size=(B, H, H, 3)).astype(np.float32),
        "img_t_aug": rng.normal(size=(B, H, H, 3)).astype(np.float32),
    }
    sched = {"lr": jnp.asarray(1e-3), "lr_dis": jnp.asarray(1e-4),
             "warm": jnp.asarray(1.0), "fresh": jnp.asarray(1.0),
             "eps_on": jnp.asarray(1.0)}
    single = {k: jnp.asarray(v) for k, v in batch_np.items()}
    s1, m1 = step(state, single, sched)
    mesh = make_mesh()
    with mesh:
        state_r = replicate_state(state, mesh)
        s8, m8 = step(state_r, shard_batch(batch_np, mesh), sched)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s1.seg.params)[0]),
        np.asarray(jax.tree.leaves(s8.seg.params)[0]), rtol=1e-4, atol=1e-6)
    # the epsilon ascent really ran and its update is sharding-invariant
    assert float(m1["eps_step_norm"]) > 0.0
    for k in ("seg_s", "seg_style", "loss_consist", "eps_step_norm",
              "sampling_norm"):
        assert float(m1[k]) == pytest.approx(float(m8[k]), rel=1e-3), k
    np.testing.assert_allclose(np.asarray(s1.sampling),
                               np.asarray(s8.sampling), rtol=1e-3, atol=1e-5)


def test_bcl_sharded_step_matches_single_device(rng):
    """BCL self-training step under the mesh (VERDICT r3 #3b): the
    host-generated class-balanced pseudo-labels (reference
    Trainer_BCL.py:102-220) enter the step as a plain batch key, so the
    sharded step must reproduce the single-device update."""
    from slcl_tpu.models.deeplabv2 import BCLDeepLab
    from slcl_tpu.train.state import NetState, TrainState, make_optimizer
    from slcl_tpu.train.steps_extra import make_bcl_step
    cfg = Config()
    cfg.method = "bcl"
    cfg.model.layers = (1, 1, 1, 1)
    cfg.model.base = 8
    model = BCLDeepLab(num_classes=cfg.model.num_classes, layers=(1, 1, 1, 1),
                       base=8, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, H, 3), jnp.float32),
                   True, True)
    tx = make_optimizer("sgd", 1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(0),
        seg=NetState(params=v["params"], batch_stats=v.get("batch_stats", {}),
                     opt_state=tx.init(v["params"])))
    step = make_bcl_step(cfg, model, {"seg": tx})
    B = 8
    plabel = rng.integers(0, 4, size=(B, H, H)).astype(np.int32)
    plabel[:, ::3] = 255  # ignore rows, as the thresholded pass produces
    batch_np = {
        "img_s": rng.normal(size=(B, H, H, 3)).astype(np.float32),
        "lab_s": rng.integers(0, 4, size=(B, H, H)).astype(np.int32),
        "img_t": rng.normal(size=(B, H, H, 3)).astype(np.float32),
        "plabel_t": plabel,
    }
    sched = {"lr": jnp.asarray(1e-3), "lr_dis": jnp.asarray(1e-4),
             "warm": jnp.asarray(1.0)}
    single = {k: jnp.asarray(v) for k, v in batch_np.items()}
    s1, m1 = step(state, single, sched)
    mesh = make_mesh()
    with mesh:
        state_r = replicate_state(state, mesh)
        s8, m8 = step(state_r, shard_batch(batch_np, mesh), sched)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s1.seg.params)[0]),
        np.asarray(jax.tree.leaves(s8.seg.params)[0]), rtol=1e-4, atol=1e-6)
    for k in ("seg_s", "seg_t_pseudo", "loss_ent", "metric_loss"):
        assert float(m1[k]) == pytest.approx(float(m8[k]), rel=1e-4), k


def _assert_tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_sharded_checkpoint_roundtrip(rng, tmp_path):
    """Orbax checkpoint round-trip across topologies (VERDICT r3 #4; the
    reference's save/restore semantics — utils/callbacks.py:45-97 — plus
    the TPU topology dimension): (a) a TrainState saved with fsdp-sharded
    leaves on a 2x4 mesh restores bit-equal on a single device AND on a
    different (4 data x 2 model) mesh shape; (b) a single-device
    checkpoint restores into an fsdp-sharded template and the restored
    state runs a training step that matches the single-device step."""
    import orbax.checkpoint as ocp
    from slcl_tpu.parallel.mesh import fsdp_shard_state
    _, state, step = _setup()
    ckptr = ocp.StandardCheckpointer()

    mesh = make_mesh(8, model_axis=4)  # 2 data x 4 model
    with mesh:
        state_f = fsdp_shard_state(state, mesh, min_size=1024)
    p_sharded = tmp_path / "ckpt_sharded"
    ckptr.save(p_sharded, state_f, force=True)
    ckptr.wait_until_finished()

    # (a1) restore on a single device (template = unsharded state)
    restored_single = ckptr.restore(p_sharded, state)
    _assert_tree_equal(restored_single, state)

    # (a2) restore at a different mesh shape (template sharded 4x2)
    mesh2 = make_mesh(8, model_axis=2)
    with mesh2:
        tmpl2 = fsdp_shard_state(state, mesh2, min_size=1024)
        restored_m2 = ckptr.restore(p_sharded, tmpl2)
    _assert_tree_equal(restored_m2, state)

    # (b) single-device checkpoint into a sharded template, then train
    p_single = tmp_path / "ckpt_single"
    ckptr.save(p_single, state, force=True)
    ckptr.wait_until_finished()
    batch_np = _batch(rng)
    sched = {"lr": jnp.asarray(1e-3), "lr_dis": jnp.asarray(1e-4),
             "warm": jnp.asarray(1.0)}
    s1, m1 = step(state, {k: jnp.asarray(v) for k, v in batch_np.items()},
                  sched)
    with mesh:
        restored_f = ckptr.restore(p_single, state_f)
        s8, m8 = step(restored_f, shard_batch(batch_np, mesh), sched)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s1.seg.params)[0]),
        np.asarray(jax.tree.leaves(s8.seg.params)[0]), rtol=1e-4, atol=1e-6)
    assert float(m1["seg_s"]) == pytest.approx(float(m8["seg_s"]), rel=1e-5)
