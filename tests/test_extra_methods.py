"""DDFSeg / AdaptEvery / BCL steps + their model families (tiny shapes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slcl_tpu.config import Config
from slcl_tpu.models.ddfseg import DDFNet, SegDecoder
from slcl_tpu.models.deeplabv2 import BCLDeepLab
from slcl_tpu.models.discriminators import PatchGAN
from slcl_tpu.models.pointnet import PointNetCls, feature_transform_regularizer
from slcl_tpu.models.resnet_unet import ResNetUNetPoint
from slcl_tpu.train.state import NetState, TrainState, make_optimizer
from slcl_tpu.train.steps_extra import (make_adaptevery_step, make_bcl_step,
                                        make_ddfseg_step)

H = 32


def _net(model, rng_key, *args, tx=None, rngs_extra=None, **kwargs):
    rngs = {"params": jax.random.PRNGKey(rng_key)}
    if rngs_extra:
        rngs.update(rngs_extra)
    variables = model.init(rngs, *args, **kwargs)
    tx = tx or make_optimizer("adam", 1e-4)
    return NetState(params=variables["params"],
                    batch_stats=variables.get("batch_stats", {}),
                    opt_state=tx.init(variables["params"])), tx, variables


def test_pointnet_shapes(rng):
    pts = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    model = PointNetCls(k=1, feature_transform=True)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, pts, True)
    (logits, trans, trans_feat), _ = model.apply(
        variables, pts, True, rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    assert logits.shape == (2, 1)
    assert trans.shape == (2, 3, 3)
    assert trans_feat.shape == (2, 64, 64)
    reg = feature_transform_regularizer(trans_feat)
    assert np.isfinite(float(reg))


def test_ddfnet_and_segdecoder_shapes(rng):
    imgs = jnp.asarray(rng.normal(size=(1, H, H, 3)).astype(np.float32))
    net = DDFNet(dtype=jnp.float32)
    variables = net.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, imgs, imgs, True)
    out, _ = net.apply(variables, imgs, imgs, True,
                       rngs={"dropout": jax.random.PRNGKey(2)},
                       mutable=["batch_stats"])
    assert out["content_s"].shape == (1, H // 8, H // 8, 512)
    assert out["fake_img_s_t"].shape == (1, H, H, 1)
    assert out["recon_imgs"].shape == (1, H, H, 1)
    assert float(jnp.abs(out["fake_img_s_t"]).max()) <= 1.0  # tanh
    seg = SegDecoder(dtype=jnp.float32)
    sv = seg.init({"params": jax.random.PRNGKey(3),
                   "dropout": jax.random.PRNGKey(4)},
                  out["content_s"], True)
    pred = seg.apply(sv, out["content_s"], True,
                     rngs={"dropout": jax.random.PRNGKey(5)})
    assert pred.shape == (1, H, H, 4)


def test_bcl_deeplab_pair(rng):
    model = BCLDeepLab(num_classes=4, layers=(1, 1, 1, 1), pair=True,
                       dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, H, H, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, True, True)
    assert "target_conv1" in variables["params"]
    pred_s, feat_s = model.apply(variables, x, False, True)
    pred_t, feat_t = model.apply(variables, x, False, False)
    assert pred_s.shape == (1, H, H, 4)
    assert feat_s.shape[-1] == 16  # 4 ASPP branches x 4 classes
    assert not np.allclose(np.asarray(pred_s), np.asarray(pred_t))


def test_adaptevery_step(rng):
    cfg = Config()
    cfg.model.num_classes = 4
    from slcl_tpu.models.discriminators import UncertaintyDiscriminator
    model = ResNetUNetPoint(num_classes=4, n_points=32, dtype=jnp.float32)
    x = jnp.zeros((1, H, H, 3), jnp.float32)
    seg_state, seg_tx, _ = _net(model, 0, x, True,
                                tx=make_optimizer("sgd", 1e-3),
                                rngs_extra={"dropout": jax.random.PRNGKey(9)})
    d_main = UncertaintyDiscriminator(dtype=jnp.float32)
    d_aux = UncertaintyDiscriminator(dtype=jnp.float32)
    d_ent = UncertaintyDiscriminator(dtype=jnp.float32)
    d_point = PointNetCls(k=1, dtype=jnp.float32)
    dx = jnp.zeros((1, H, H, 4), jnp.float32)
    dm_state, dm_tx, _ = _net(d_main, 1, dx)
    da_state, da_tx, _ = _net(d_aux, 2, dx)
    de_state, de_tx, _ = _net(d_ent, 3, dx)
    dp_state, dp_tx, _ = _net(d_point, 4, jnp.zeros((1, 32, 3)), True,
                              rngs_extra={"dropout": jax.random.PRNGKey(5)})
    txs = {"seg": seg_tx, "d_main": dm_tx, "d_aux": da_tx,
           "d_ent": de_tx, "d_point": dp_tx}
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       rng=jax.random.PRNGKey(0), seg=seg_state,
                       d_main=dm_state, d_aux=da_state,
                       extra={"d_ent": de_state, "d_point": dp_state})
    step = make_adaptevery_step(cfg, model, d_main, d_aux, d_ent, d_point, txs)
    batch = {
        "img_s": jnp.asarray(rng.normal(size=(1, H, H, 3)).astype(np.float32)),
        "lab_s": jnp.asarray(rng.integers(0, 4, size=(1, H, H)).astype(np.int32)),
        "vert_s": jnp.asarray(rng.normal(size=(1, 32, 3)).astype(np.float32)),
        "img_t": jnp.asarray(rng.normal(size=(1, H, H, 3)).astype(np.float32)),
    }
    sched = {"lr": jnp.asarray(1e-3), "lr_dis": jnp.asarray(1e-4)}
    state2, metrics = step(state, batch, sched)
    for k in ("seg_s", "loss_point", "loss_adv", "loss_adv_ent",
              "loss_adv_point"):
        assert np.isfinite(float(metrics[k])), k
    assert not np.allclose(
        np.asarray(jax.tree.leaves(state.extra["d_point"].params)[0]),
        np.asarray(jax.tree.leaves(state2.extra["d_point"].params)[0]))


def test_ddfseg_step(rng):
    cfg = Config()
    ddfnet = DDFNet(dtype=jnp.float32)
    segdec = SegDecoder(dtype=jnp.float32)
    imgs = jnp.zeros((1, H, H, 3), jnp.float32)
    dv = ddfnet.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(1)}, imgs, imgs, True)
    sv = segdec.init({"params": jax.random.PRNGKey(2),
                      "dropout": jax.random.PRNGKey(3)},
                     jnp.zeros((1, H // 8, H // 8, 512)), True)
    params = {"ddfnet": dv["params"], "segdecoder": sv["params"]}
    bs = {"ddfnet": dv.get("batch_stats", {}),
          "segdecoder": sv.get("batch_stats", {})}
    tx = make_optimizer("adam", 2e-4)
    seg_state = NetState(params=params, batch_stats=bs, opt_state=tx.init(params))
    d_t = PatchGAN(dtype=jnp.float32)
    d_s = PatchGAN(aux=True, dtype=jnp.float32)
    d_seg = PatchGAN(dtype=jnp.float32)
    dt_state, dt_tx, _ = _net(d_t, 4, jnp.zeros((1, H, H, 1)))
    ds_state, ds_tx, _ = _net(d_s, 5, jnp.zeros((1, H, H, 1)))
    dseg_state, dseg_tx, _ = _net(d_seg, 6, jnp.zeros((1, H, H, 4)))
    txs = {"seg": tx, "d_main": dt_tx, "d_aux": ds_tx, "d_seg": dseg_tx}
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       rng=jax.random.PRNGKey(0), seg=seg_state,
                       d_main=dt_state, d_aux=ds_state,
                       extra={"d_seg": dseg_state})
    step = make_ddfseg_step(cfg, ddfnet, segdec, d_s, d_t, d_seg, txs)
    batch = {
        "img_s": jnp.asarray(rng.normal(size=(1, H, H, 3)).astype(np.float32)),
        "lab_s": jnp.asarray(rng.integers(0, 4, size=(1, H, H)).astype(np.int32)),
        "img_t": jnp.asarray(rng.normal(size=(1, H, H, 3)).astype(np.float32)),
    }
    sched = {"lr": jnp.asarray(2e-4), "lr_dis": jnp.asarray(2e-4)}
    state2, metrics = step(state, batch, sched)
    for k in ("seg_s", "cyc_loss_s", "zero_loss_s", "loss_adv_t"):
        assert np.isfinite(float(metrics[k])), k
    p0 = jax.tree.leaves(state.seg.params["ddfnet"])[0]
    p1 = jax.tree.leaves(state2.seg.params["ddfnet"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_bcl_step(rng):
    cfg = Config()
    model = BCLDeepLab(num_classes=4, layers=(1, 1, 1, 1), dtype=jnp.float32)
    x = jnp.zeros((1, H, H, 3), jnp.float32)
    tx = make_optimizer("sgd", 1e-3)
    seg_state, tx, _ = _net(model, 0, x, True, True, tx=tx)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       rng=jax.random.PRNGKey(0), seg=seg_state)
    step = make_bcl_step(cfg, model, {"seg": tx})
    plabel = rng.integers(0, 4, size=(1, H, H)).astype(np.int32)
    plabel[0, :4] = 255  # ignore region
    batch = {
        "img_s": jnp.asarray(rng.normal(size=(1, H, H, 3)).astype(np.float32)),
        "lab_s": jnp.asarray(rng.integers(0, 4, size=(1, H, H)).astype(np.int32)),
        "img_t": jnp.asarray(rng.normal(size=(1, H, H, 3)).astype(np.float32)),
        "plabel_t": jnp.asarray(plabel),
    }
    sched = {"lr": jnp.asarray(1e-3)}
    state2, metrics = step(state, batch, sched)
    for k in ("seg_s", "seg_t_pseudo", "loss_ent", "metric_loss"):
        assert np.isfinite(float(metrics[k])), k


def test_cross_entropy_ignore(rng):
    from slcl_tpu.ops import losses as L
    import torch
    import torch.nn.functional as F
    logits = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=(2, 8, 8)).astype(np.int64)
    labels[0, :3] = 255
    got = float(L.cross_entropy_ignore(jnp.asarray(logits),
                                       jnp.asarray(labels.astype(np.int32))))
    want = float(F.cross_entropy(torch.from_numpy(logits).permute(0, 3, 1, 2),
                                 torch.from_numpy(labels), ignore_index=255))
    assert got == pytest.approx(want, rel=1e-5)
