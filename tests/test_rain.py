"""RAIN stack: model shapes, AdaIN math, pretrain + seg steps, eps ascent."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slcl_tpu.config import Config
from slcl_tpu.models import build_segmentor
from slcl_tpu.models.rain import (RAIN, adain_with_noise, calc_feat_mean_std,
                                  calc_mean_std)
from slcl_tpu.train.state import NetState, TrainState, make_optimizer
from slcl_tpu.train.steps_rain import make_pretrain_rain_step, make_rain_seg_step

H = 64


def test_calc_mean_std_matches_torch_semantics(rng):
    """torch .var() default is unbiased (ddof=1) — reference utils_.py:190."""
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    mean, std = calc_mean_std(jnp.asarray(x))
    want_var = x.reshape(2, -1, 16).var(axis=1, ddof=1) + 1e-5
    np.testing.assert_allclose(np.asarray(mean)[:, 0, 0, :],
                               x.reshape(2, -1, 16).mean(axis=1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(std)[:, 0, 0, :],
                               np.sqrt(want_var), rtol=1e-5)


def test_adain_with_noise(rng):
    content = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    stats = rng.normal(size=(2, 8)).astype(np.float32)
    out = np.asarray(adain_with_noise(jnp.asarray(content), jnp.asarray(stats)))
    # renormalized content has the style mean/std per channel
    got_mean = out.reshape(2, -1, 4).mean(axis=1)
    np.testing.assert_allclose(got_mean, stats[:, :4], rtol=1e-3, atol=1e-3)


@pytest.fixture(scope="module")
def rain_setup():
    model = RAIN()
    x = jnp.zeros((1, H, H, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "noise": jax.random.PRNGKey(1)}, x, x)
    return model, variables


def test_rain_losses_and_transfer_shapes(rain_setup, rng):
    model, variables = rain_setup
    c = jnp.asarray(rng.normal(size=(1, H, H, 3)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(1, H, H, 3)).astype(np.float32))
    lc, ls, ll, lr_ = model.apply(variables, c, s, method="losses",
                                  rngs={"noise": jax.random.PRNGKey(2)})
    for v in (lc, ls, ll, lr_):
        assert np.isfinite(float(v))
    img, sampling = model.apply(variables, c, s, None, method="style_transfer",
                                rngs={"noise": jax.random.PRNGKey(3)})
    assert img.shape == (1, H, H, 3)
    assert sampling.shape == (1, 512)
    # passing the sampling back reproduces deterministically
    img2, _ = model.apply(variables, c, s, sampling, method="style_transfer",
                          rngs={"noise": jax.random.PRNGKey(99)})
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2), atol=1e-5)


def test_pretrain_rain_step_updates_decoder_not_encoder(rain_setup, rng):
    model, variables = rain_setup
    cfg = Config()
    cfg.method = "pretrain_rain"
    tx = make_optimizer("adam", 1e-4)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       rng=jax.random.PRNGKey(0),
                       seg=NetState(params=variables["params"], batch_stats={},
                                    opt_state=tx.init(variables["params"])))
    step = make_pretrain_rain_step(cfg, model, {"seg": tx})
    batch = {"img_s": jnp.asarray(rng.normal(size=(1, H, H, 3)).astype(np.float32)),
             "img_t": jnp.asarray(rng.normal(size=(1, H, H, 3)).astype(np.float32))}
    sched = {"lr": jnp.asarray(1e-4)}
    state2, metrics = step(state, batch, sched)
    for k in ("loss_c", "loss_s", "loss_l", "loss_r"):
        assert np.isfinite(float(metrics[k])), k
    enc0 = jax.tree.leaves(state.seg.params["encoder"])[0]
    enc1 = jax.tree.leaves(state2.seg.params["encoder"])[0]
    np.testing.assert_array_equal(np.asarray(enc0), np.asarray(enc1))
    dec0 = jax.tree.leaves(state.seg.params["decoder"])[0]
    dec1 = jax.tree.leaves(state2.seg.params["decoder"])[0]
    assert not np.allclose(np.asarray(dec0), np.asarray(dec1))
    fce0 = jax.tree.leaves(state.seg.params["fc_encoder"])[0]
    fce1 = jax.tree.leaves(state2.seg.params["fc_encoder"])[0]
    assert not np.allclose(np.asarray(fce0), np.asarray(fce1))


def test_rain_seg_step_and_eps_ascent(rain_setup, rng):
    rain_model, rain_vars = rain_setup
    cfg = Config()
    cfg.model.backbone = "drunet"
    cfg.model.filters = 8
    cfg.model.n_block = 2
    cfg.model.bottleneck_depth = 2
    cfg.model.dtype = "float32"
    seg_model = build_segmentor(cfg.model)
    x = jnp.zeros((1, H, H, 3), jnp.float32)
    seg_vars = seg_model.init(jax.random.PRNGKey(0), x, True)
    tx = make_optimizer("sgd", 1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(0),
        seg=NetState(params=seg_vars["params"],
                     batch_stats=seg_vars["batch_stats"],
                     opt_state=tx.init(seg_vars["params"])),
        sampling=jnp.zeros((1, 512), jnp.float32),
        extra={"rain": rain_vars["params"]})
    step = make_rain_seg_step(cfg, seg_model, rain_model, {"seg": tx})
    batch = {
        "img_s": jnp.asarray(rng.normal(size=(2, H, H, 3)).astype(np.float32)),
        "lab_s": jnp.asarray(rng.integers(0, 4, size=(2, H, H)).astype(np.int32)),
        "img_t": jnp.asarray(rng.normal(size=(2, H, H, 3)).astype(np.float32)),
    }
    # warmup: fresh sampling, no eps update
    sched = {"lr": jnp.asarray(1e-3), "fresh": jnp.asarray(1.0),
             "eps_on": jnp.asarray(0.0)}
    state2, m = step(state, batch, sched)
    assert np.isfinite(float(m["seg"])) and np.isfinite(float(m["loss_consist"]))
    s_fresh = np.asarray(state2.sampling)
    # post-warmup: eps ascent must move the carried sampling
    sched = {"lr": jnp.asarray(1e-3), "fresh": jnp.asarray(0.0),
             "eps_on": jnp.asarray(1.0)}
    state3, _ = step(state2, batch, sched)
    assert not np.allclose(np.asarray(state3.sampling), s_fresh)


def test_mccl_with_rain_step(rain_setup, rng):
    """Full SLCL+RAIN path: stylize, 4-way concat forward, consistency,
    contrastive, eps ascent (Trainer_MCCL.py rain=True)."""
    from slcl_tpu.models import build_segmentor
    from slcl_tpu.train.state import create_train_state
    from slcl_tpu.train.steps import build_step

    rain_model, rain_vars = rain_setup
    cfg = Config()
    cfg.method = "mccl"
    cfg.model.backbone = "drunet"
    cfg.model.filters = 8
    cfg.model.n_block = 2
    cfg.model.bottleneck_depth = 2
    cfg.model.dtype = "float32"
    cfg.rain.enabled = True
    cfg.rain.update_eps = True
    cfg.contrastive.part = 2
    cfg.contrastive.wtd_ave = True
    cfg.contrastive.CNR = True
    cfg.contrastive.CNR_w = 1e-4
    seg_model = build_segmentor(cfg.model)
    state, txs = create_train_state(cfg, seg_model, sample_shape=(1, H, H, 3))
    state = state.replace(extra={"rain": rain_vars["params"]},
                          sampling=jnp.zeros((1, 512), jnp.float32))
    step = build_step(cfg, seg_model, txs, rain_model=rain_model)
    batch = {
        "img_s": jnp.asarray(rng.normal(size=(2, H, H, 3)).astype(np.float32)),
        "lab_s": jnp.asarray(rng.integers(0, 4, size=(2, H, H)).astype(np.int32)),
        "img_t": jnp.asarray(rng.normal(size=(2, H, H, 3)).astype(np.float32)),
        "img_t_aug": jnp.asarray(rng.normal(size=(2, H, H, 3)).astype(np.float32)),
    }
    sched = {"lr": jnp.asarray(1e-3), "lr_dis": jnp.asarray(1e-4),
             "warm": jnp.asarray(1.0), "fresh": jnp.asarray(1.0),
             "eps_on": jnp.asarray(1.0)}
    state2, m = step(state, batch, sched)
    for k in ("seg_s", "seg_style", "loss_consist", "inter_c_loss", "CNR"):
        assert np.isfinite(float(m[k])), k
    assert not np.allclose(np.asarray(state2.sampling), np.asarray(state.sampling))


@pytest.mark.parametrize("mode", ["mulstyle", "mulstyle2"])
def test_mccl_rain_mulstyle_variants(rain_setup, rng, mode):
    """Whole-batch stylization operands (Trainer_MCCL.py:196-202): mulstyle
    pairs each content image with its own style (per-image sampling rows);
    mulstyle2 stylizes the whole content batch with ONE style image."""
    from slcl_tpu.models import build_segmentor
    from slcl_tpu.train.state import create_train_state
    from slcl_tpu.train.steps import build_step

    rain_model, rain_vars = rain_setup
    cfg = Config()
    cfg.method = "mccl"
    cfg.model.backbone = "drunet"
    cfg.model.filters = 8
    cfg.model.n_block = 2
    cfg.model.bottleneck_depth = 2
    cfg.model.dtype = "float32"
    cfg.rain.enabled = True
    setattr(cfg.rain, mode, True)
    cfg.contrastive.part = 2
    B = 2
    n_sty = B if mode == "mulstyle" else 1
    seg_model = build_segmentor(cfg.model)
    state, txs = create_train_state(cfg, seg_model, sample_shape=(1, H, H, 3))
    state = state.replace(extra={"rain": rain_vars["params"]},
                          sampling=jnp.zeros((n_sty, 512), jnp.float32))
    step = build_step(cfg, seg_model, txs, rain_model=rain_model)
    batch = {
        "img_s": jnp.asarray(rng.normal(size=(B, H, H, 3)).astype(np.float32)),
        "lab_s": jnp.asarray(rng.integers(0, 4, size=(B, H, H)).astype(np.int32)),
        "img_t": jnp.asarray(rng.normal(size=(B, H, H, 3)).astype(np.float32)),
        "img_t_aug": jnp.asarray(rng.normal(size=(B, H, H, 3)).astype(np.float32)),
    }
    sched = {"lr": jnp.asarray(1e-3), "lr_dis": jnp.asarray(1e-4),
             "warm": jnp.asarray(1.0), "fresh": jnp.asarray(1.0),
             "eps_on": jnp.asarray(0.0)}
    state2, m = step(state, batch, sched)
    # both modes stylize the WHOLE content batch -> style seg loss over B
    for k in ("seg_s", "seg_style", "loss_consist"):
        assert np.isfinite(float(m[k])), k
    assert state2.sampling.shape == (n_sty, 512)
