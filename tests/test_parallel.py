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
