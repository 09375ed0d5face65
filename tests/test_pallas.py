"""Pallas kernels vs the eager jnp reference implementations.

Run in interpreter mode on CPU (conftest pins JAX_PLATFORMS=cpu; pallas TPU
kernels execute via pltpu.force_tpu_interpret_mode there).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from slcl_tpu.ops import centroids as cen
from slcl_tpu.ops import losses as L
from slcl_tpu.ops.pallas import (mpcl_loss_fused, pseudo_label_fused,
                                 soft_centroids_fused)

M, F, C = 2500, 32, 4  # deliberately not a multiple of the tile size


@pytest.fixture
def data(rng):
    feats = rng.normal(size=(M, F)).astype(np.float32)
    labels = rng.integers(0, C, size=(M,)).astype(np.int32)
    centers = rng.normal(size=(C, F)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    sel = rng.integers(0, 2, size=(M,)).astype(np.float32)
    return (jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(centers),
            jnp.asarray(sel))


def _ref_mpcl(feats, labels, centers, sel=None, margin=0.4, easy=False):
    fn = feats / (jnp.linalg.norm(feats, axis=1, keepdims=True) + 1e-12)
    return L.mpcl_loss(fn, labels, centers, temperature=0.1,
                       base_temperature=1.0, margin=margin, easy_margin=easy,
                       pixel_sel_loc=sel, num_classes=C)


@pytest.mark.parametrize("easy", [False, True])
@pytest.mark.parametrize("use_sel", [False, True])
def test_mpcl_fused_forward(data, easy, use_sel):
    feats, labels, centers, sel = data
    with pltpu.force_tpu_interpret_mode():
        got = mpcl_loss_fused(feats, labels, centers, 0.1, 1.0, 0.4, easy,
                              use_sel, sel if use_sel else None)
    want = _ref_mpcl(feats, labels, centers, sel if use_sel else None,
                     easy=easy)
    assert float(got) == pytest.approx(float(want), rel=1e-4)


@pytest.mark.parametrize("use_sel", [False, True])
def test_mpcl_fused_gradient(data, use_sel):
    feats, labels, centers, sel = data
    sel_arg = sel if use_sel else None

    def fused(f):
        return mpcl_loss_fused(f, labels, centers, 0.1, 1.0, 0.4, False,
                               use_sel, sel_arg)

    def ref(f):
        return _ref_mpcl(f, labels, centers, sel_arg)

    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(fused)(feats)
    g_want = jax.grad(ref)(feats)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=2e-3, atol=1e-7)


def test_pseudo_label_fused(data):
    feats, _, centers, _ = data
    with pltpu.force_tpu_interpret_mode():
        lab, mask = pseudo_label_fused(feats, centers, 0.25)
    feats4d = feats.reshape(1, 50, 50, F)
    want_lab, want_mask = cen.generate_pseudo_label(feats4d, centers,
                                                    pixel_sel_th=0.25)
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(want_lab))
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(want_mask))


@pytest.mark.parametrize("weighted", [True, False])
@pytest.mark.parametrize("threshold", [0.0, 0.4])
def test_soft_centroids_fused(data, rng, weighted, threshold):
    feats, _, _, _ = data
    logits = rng.normal(size=(M, C)).astype(np.float32)
    probs = jnp.asarray(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    P = 2
    assign = jnp.asarray(rng.integers(0, P, size=(M,)).astype(np.int32))
    with pltpu.force_tpu_interpret_mode():
        cents, ratio = soft_centroids_fused(
            feats, probs, assign, partition=P, threshold=threshold,
            weighted_ave=weighted, num_classes=C)
    # oracle from the same assignment
    fnp, pnp, anp = map(np.asarray, (feats, probs, assign))
    certain = (pnp.max(1) >= threshold).astype(np.float32) \
        if 0 < threshold < 1 else np.ones(M, np.float32)
    if weighted:
        w = pnp * certain[:, None]
    else:
        w = (np.eye(C)[pnp.argmax(1)]) * certain[:, None]
    want = np.zeros((P, C, F), np.float32)
    for p in range(P):
        wp = w * (anp == p)[:, None]
        want[p] = (wp.T @ fnp) / (wp.sum(0)[:, None] + 1e-7)
    np.testing.assert_allclose(np.asarray(cents), want, rtol=1e-4, atol=1e-5)
    assert float(ratio) == pytest.approx(certain.mean(), rel=1e-5)


def test_mpcl_pseudo_fused_forward_and_grad(data):
    """v3 kernel: pseudo-labels + gap mask + target MPCL in one pass must
    match the two-op jnp composition (generate_pseudo_label -> mpcl with
    pixel_sel_loc weighting) in value and feature gradient."""
    from slcl_tpu.ops.pallas import mpcl_pseudo_fused
    feats, _labels, centers, _sel = data

    def ref(f):
        lab, sel = cen.generate_pseudo_label(
            f.reshape(1, 50, 50, F), centers, pixel_sel_th=0.25)
        return L.mpcl_loss_calc(
            f.reshape(1, 50, 50, F), lab, centers, temperature=0.1,
            base_temperature=1.0, margin=0.2, pixel_sel_loc=sel,
            resize_labels=False)

    feats_sq = feats[:2500]
    with pltpu.force_tpu_interpret_mode():
        got = mpcl_pseudo_fused(feats_sq, centers, 0.1, 1.0, 0.2, False, 0.25)
        ggot = jax.grad(lambda f: mpcl_pseudo_fused(
            f, centers, 0.1, 1.0, 0.2, False, 0.25))(feats_sq)
    want = ref(feats_sq)
    gwant = jax.grad(ref)(feats_sq)
    assert float(got) == pytest.approx(float(want), rel=1e-4)
    np.testing.assert_allclose(np.asarray(ggot), np.asarray(gwant),
                               rtol=1e-3, atol=1e-6)
