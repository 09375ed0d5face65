"""Direct numerical parity against the reference implementation.

These tests import the ACTUAL reference loss module (mounted read-only at
/root/reference) and compare its outputs to slcl_tpu's jnp implementations on
identical random inputs. They are skipped when the reference mount is absent
(end-user installs). The reference hardcodes .cuda() everywhere; a no-op
monkeypatch runs it on CPU torch.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference mount not available")

if os.path.isdir(REF):
    import torch

    # the reference assumes CUDA; run its math on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    _real_eye = torch.eye

    sys.path.insert(0, REF)
    from utils import loss as ref_loss  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from slcl_tpu.ops import losses as L  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20240816)


def test_jaccard_loss_vs_reference(rng):
    logits = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)  # NCHW
    labels = rng.integers(0, 4, size=(2, 16, 16))
    want = float(ref_loss.jaccard_loss(torch.from_numpy(labels),
                                       torch.from_numpy(logits)))
    got = float(L.jaccard_loss(jnp.asarray(logits.transpose(0, 2, 3, 1)),
                               jnp.asarray(labels.astype(np.int32))))
    assert got == pytest.approx(want, rel=1e-5)


def test_loss_calc_vs_reference(rng):
    logits = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
    labels = rng.integers(0, 4, size=(2, 16, 16))
    want = float(ref_loss.loss_calc(torch.from_numpy(logits),
                                    torch.from_numpy(labels), jaccard=True))
    got = float(L.loss_calc(jnp.asarray(logits.transpose(0, 2, 3, 1)),
                            jnp.asarray(labels.astype(np.int32)), jaccard=True))
    assert got == pytest.approx(want, rel=1e-5)


def test_dice_loss_vs_reference(rng):
    logits = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
    labels = rng.integers(0, 4, size=(2, 16, 16))
    want = float(ref_loss.dice_loss(torch.from_numpy(logits),
                                    torch.from_numpy(labels)))
    got = float(L.dice_loss(jnp.asarray(logits.transpose(0, 2, 3, 1)),
                            jnp.asarray(labels.astype(np.int32))))
    assert got == pytest.approx(want, rel=1e-5)


def test_loss_entropy_vs_reference(rng):
    logits = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    probs = torch.softmax(torch.from_numpy(logits), dim=1)
    for mode in ("mean", "sum"):
        want = float(ref_loss.loss_entropy(probs, "cpu", 1e-7, mode))
        got = float(L.loss_entropy(
            jnp.asarray(probs.numpy().transpose(0, 2, 3, 1)), 1e-7, mode))
        assert got == pytest.approx(want, rel=1e-5), mode


def test_contrastive_loss_vs_reference(rng):
    cs = rng.normal(size=(4, 32)).astype(np.float32)
    ct = rng.normal(size=(4, 32)).astype(np.float32)
    mod = ref_loss.ContrastiveLoss(tau=5, n_class=4, norm=True)
    for bg in (False, True):
        for split in (False, True):
            want = float(mod.forward(torch.from_numpy(cs).clone(),
                                     torch.from_numpy(ct).clone(),
                                     bg=bg, split=split))
            got = float(L.centroid_contrastive_loss(
                jnp.asarray(cs), jnp.asarray(ct), bg=bg, split=split))
            assert got == pytest.approx(want, rel=1e-4), (bg, split)


def test_mpcl_vs_reference(rng):
    n, f, c = 128, 32, 4
    feats = rng.normal(size=(n, f)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    centers = rng.normal(size=(c, f)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, c, size=(n,))
    sel = rng.integers(0, 2, size=(n,)).astype(np.float32)

    mpcl = ref_loss.MPCL("cpu", num_class=c, temperature=0.1,
                         base_temperature=1.0, m=0.4)
    t_feats = torch.from_numpy(feats).unsqueeze(1)      # (N, 1, F)
    t_centers = torch.from_numpy(centers.T)             # (F, C)
    for use_sel in (False, True):
        want = float(mpcl.forward(
            t_feats.clone(), torch.from_numpy(labels).clone(), t_centers,
            pixel_sel_loc=torch.from_numpy(sel) if use_sel else None))
        got = float(L.mpcl_loss(
            jnp.asarray(feats), jnp.asarray(labels.astype(np.int32)),
            jnp.asarray(centers), temperature=0.1, base_temperature=1.0,
            margin=0.4,
            pixel_sel_loc=jnp.asarray(sel) if use_sel else None,
            num_classes=c))
        assert got == pytest.approx(want, rel=1e-4), use_sel


def test_chamfer_vs_reference(rng):
    x = rng.normal(size=(2, 30, 3)).astype(np.float32)
    y = rng.normal(size=(2, 30, 3)).astype(np.float32)
    # reference batch_pairwise_dist uses .cuda() on an index tensor
    want = float(ref_loss.batch_NN_loss(torch.from_numpy(x),
                                        torch.from_numpy(y)))
    got = float(L.chamfer_loss(jnp.asarray(x), jnp.asarray(y)))
    assert got == pytest.approx(want, rel=1e-4)


def test_class_prior_vs_reference(rng):
    logits = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    probs = torch.softmax(torch.from_numpy(logits), dim=1)
    prior = torch.tensor([0.9146, 0.0253, 0.0309, 0.0292])
    want = float(ref_loss.loss_class_prior(probs, prior, 1.0, "cpu"))
    got = float(L.loss_class_prior(
        jnp.asarray(probs.numpy().transpose(0, 2, 3, 1)),
        prior.numpy(), 1.0))
    assert got == pytest.approx(want, rel=1e-5)


def _import_ref_utils():
    """Import the reference utils_ module with its unavailable heavy deps
    (nibabel, SimpleITK, skimage, torchvision, easydict) stubbed out — only
    the pure-torch centroid/pseudo-label math is exercised."""
    import types
    from unittest import mock
    stubs = {}
    for name in ("nibabel", "SimpleITK", "easydict", "torchvision",
                 "torchvision.transforms", "torchvision.transforms.functional",
                 "skimage", "skimage.measure"):
        stubs[name] = mock.MagicMock()
    stubs["torchvision.transforms.functional"].center_crop = lambda x, s: x
    with mock.patch.dict(sys.modules, stubs):
        import importlib
        mod = importlib.import_module("utils.utils_")
        return mod


@pytest.fixture(scope="module")
def ref_utils():
    return _import_ref_utils()


def test_update_class_center_iter_vs_reference(ref_utils, rng):
    n, c, h, w = 2, 32, 8, 8
    feats = rng.normal(size=(n, c, h, w)).astype(np.float32)
    labels = rng.integers(0, 4, size=(n, h, w))
    labels[:, :2] = 0  # make a class likely absent
    centers = rng.normal(size=(4, c)).astype(np.float32)
    want = ref_utils.update_class_center_iter(
        torch.from_numpy(feats), torch.from_numpy(labels),
        torch.from_numpy(centers).clone(), m=0.9).numpy()
    from slcl_tpu.ops import centroids as cen
    got = np.asarray(cen.update_class_center_iter(
        jnp.asarray(feats.transpose(0, 2, 3, 1)),
        jnp.asarray(labels.astype(np.int32)), jnp.asarray(centers),
        momentum=0.9, num_classes=4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_generate_pseudo_label_vs_reference(ref_utils, rng):
    n, c, h, w = 2, 32, 8, 8
    feats = rng.normal(size=(n, c, h, w)).astype(np.float32)
    centers = rng.normal(size=(4, c)).astype(np.float32)
    want_lab, want_mask = ref_utils.generate_pseudo_label(
        torch.from_numpy(feats), torch.from_numpy(centers), 0.25)
    from slcl_tpu.ops import centroids as cen
    got_lab, got_mask = cen.generate_pseudo_label(
        jnp.asarray(feats.transpose(0, 2, 3, 1)), jnp.asarray(centers),
        pixel_sel_th=0.25)
    np.testing.assert_array_equal(np.asarray(got_lab), want_lab.numpy())
    np.testing.assert_array_equal(np.asarray(got_mask), want_mask.numpy())


def test_prob_2_entropy_vs_reference(ref_utils, rng):
    logits = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    probs = torch.softmax(torch.from_numpy(logits), dim=1)
    want = ref_utils.prob_2_entropy(probs).numpy()
    got = np.asarray(L.prob_2_entropy(
        jnp.asarray(probs.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=1e-5)


def test_source_cal_centroid_vs_reference(ref_utils, rng):
    """Source (hard-label) path of the reference cal_centroid incl. EMA."""
    n, c, h, w = 2, 32, 8, 8
    feats = rng.normal(size=(n, c, h, w)).astype(np.float32)
    labels = rng.integers(0, 4, size=(n, h, w))
    prev = rng.normal(size=(4, c)).astype(np.float32)
    want, _, _ = ref_utils.cal_centroid(
        torch.from_numpy(feats), torch.from_numpy(labels),
        previous_centroid=torch.from_numpy(prev).clone(), momentum=0.9)
    from slcl_tpu.ops import centroids as cen
    got = np.asarray(cen.source_centroids(
        jnp.asarray(feats.transpose(0, 2, 3, 1)),
        jnp.asarray(labels.astype(np.int32)), num_classes=4,
        previous=jnp.asarray(prev), momentum=0.9))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)


def test_rain_adain_vs_reference(ref_utils, rng):
    # the reference hardcodes 512 channels (utils_.py:209-211)
    content = rng.normal(size=(2, 512, 4, 4)).astype(np.float32)
    stats = rng.normal(size=(2, 1024)).astype(np.float32)
    want = ref_utils.adaptive_instance_normalization_with_noise(
        torch.from_numpy(content), torch.from_numpy(stats)).numpy()
    from slcl_tpu.models.rain import adain_with_noise
    got = np.asarray(adain_with_noise(
        jnp.asarray(content.transpose(0, 2, 3, 1)), jnp.asarray(stats)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-3, atol=1e-3)
