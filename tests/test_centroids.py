"""Parity tests for the centroid / pseudo-label engine
(reference utils/utils_.py:479-631 semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slcl_tpu.ops import centroids

B, H, W, F, C = 2, 8, 8, 16, 4


def test_source_centroids_matches_masked_mean(rng):
    feats = rng.normal(size=(B, H, W, F)).astype(np.float32)
    labels = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
    got = np.asarray(centroids.source_centroids(
        jnp.asarray(feats), jnp.asarray(labels), num_classes=C))
    flat_f = feats.reshape(-1, F)
    flat_l = labels.reshape(-1)
    for k in range(C):
        m = flat_l == k
        want = flat_f[m].sum(0) / (m.sum() + 1e-7)
        np.testing.assert_allclose(got[k], want, rtol=1e-4)


def test_source_centroids_ema(rng):
    feats = rng.normal(size=(B, H, W, F)).astype(np.float32)
    labels = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
    prev = rng.normal(size=(C, F)).astype(np.float32)
    cur = np.asarray(centroids.source_centroids(
        jnp.asarray(feats), jnp.asarray(labels), num_classes=C))
    got = np.asarray(centroids.source_centroids(
        jnp.asarray(feats), jnp.asarray(labels), num_classes=C,
        previous=jnp.asarray(prev), momentum=0.9))
    np.testing.assert_allclose(got, 0.9 * prev + 0.1 * cur, rtol=1e-4)


def test_source_centroids_downsamples_labels(rng):
    feats = rng.normal(size=(B, H, W, F)).astype(np.float32)
    labels = rng.integers(0, C, size=(B, 2 * H, 2 * W)).astype(np.int32)
    out = centroids.source_centroids(jnp.asarray(feats), jnp.asarray(labels),
                                     num_classes=C)
    assert out.shape == (C, F)


def test_target_soft_centroids_weighted(rng):
    """weighted_ave soft centroid: sum(p_k * f) / sum(p_k) (utils_.py:509-529)."""
    feats = rng.normal(size=(B, H, W, F)).astype(np.float32)
    logits = rng.normal(size=(B, H, W, C)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    res = centroids.target_soft_centroids(
        jnp.asarray(feats), jnp.asarray(probs), weighted_ave=True, num_classes=C)
    got = np.asarray(res.centroids)
    assert got.shape == (1, C, F)
    flat_f = feats.reshape(-1, F)
    flat_p = probs.reshape(-1, C)
    for k in range(C):
        want = (flat_p[:, k:k + 1] * flat_f).sum(0) / (flat_p[:, k].sum() + 1e-7)
        np.testing.assert_allclose(got[0, k], want, rtol=1e-4)


def test_target_soft_centroids_threshold_and_ratio(rng):
    feats = rng.normal(size=(B, H, W, F)).astype(np.float32)
    logits = 3.0 * rng.normal(size=(B, H, W, C)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    th = 0.6
    res = centroids.target_soft_centroids(
        jnp.asarray(feats), jnp.asarray(probs), threshold=th,
        weighted_ave=True, num_classes=C)
    certain = (probs.max(-1) >= th).astype(np.float32).reshape(-1)
    assert float(res.ratio) == pytest.approx(certain.mean(), rel=1e-5)
    flat_f = feats.reshape(-1, F)
    flat_p = probs.reshape(-1, C) * certain[:, None]
    want0 = (flat_p[:, 0:1] * flat_f).sum(0) / (flat_p[:, 0].sum() + 1e-7)
    np.testing.assert_allclose(np.asarray(res.centroids)[0, 0], want0, rtol=1e-4)


def test_target_hard_centroids(rng):
    feats = rng.normal(size=(B, H, W, F)).astype(np.float32)
    logits = rng.normal(size=(B, H, W, C)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    res = centroids.target_soft_centroids(
        jnp.asarray(feats), jnp.asarray(probs), weighted_ave=False, num_classes=C)
    hard = probs.argmax(-1).reshape(-1)
    flat_f = feats.reshape(-1, F)
    for k in range(C):
        m = hard == k
        want = flat_f[m].sum(0) / (m.sum() + 1e-7)
        np.testing.assert_allclose(np.asarray(res.centroids)[0, k], want, rtol=1e-4)


def test_rmc_partitions_shapes_and_mean_consistency(rng):
    """rMC with P partitions: P centroid sets whose pixel-count-weighted
    average equals the unpartitioned soft centroid."""
    P = 2
    feats = rng.normal(size=(B, H, W, F)).astype(np.float32)
    logits = rng.normal(size=(B, H, W, C)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    res = centroids.target_soft_centroids(
        jnp.asarray(feats), jnp.asarray(probs), partition=P,
        rng=jax.random.PRNGKey(0), weighted_ave=True, num_classes=C)
    assert res.centroids.shape == (P, C, F)
    # partitions differ (variance injection)
    assert not np.allclose(np.asarray(res.centroids[0]),
                           np.asarray(res.centroids[1]))
    # each partition centroid is finite
    assert np.isfinite(np.asarray(res.centroids)).all()


def test_rmc_requires_rng(rng):
    feats = jnp.zeros((B, H, W, F))
    probs = jnp.full((B, H, W, C), 0.25)
    with pytest.raises(ValueError):
        centroids.target_soft_centroids(feats, probs, partition=2)


def test_update_class_center_iter_absent_class_keeps_prev(rng):
    feats = rng.normal(size=(B, H, W, F)).astype(np.float32)
    labels = np.zeros((B, H, W), np.int32)  # only class 0 present
    prev = rng.normal(size=(C, F)).astype(np.float32)
    got = np.asarray(centroids.update_class_center_iter(
        jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(prev),
        momentum=0.9, num_classes=C))
    mean0 = feats.reshape(-1, F).mean(0)
    np.testing.assert_allclose(got[0], 0.9 * prev[0] + 0.1 * mean0, rtol=1e-4)
    for k in range(1, C):  # absent classes stay at prev (reference :585-586)
        np.testing.assert_allclose(got[k], prev[k], rtol=1e-5)


def test_generate_pseudo_label(rng):
    """Cosine argmax labels + top1-top2 gap mask (utils_.py:597-624)."""
    feats = rng.normal(size=(B, H, W, F)).astype(np.float32)
    centers = rng.normal(size=(C, F)).astype(np.float32)
    hard, mask = centroids.generate_pseudo_label(
        jnp.asarray(feats), jnp.asarray(centers), pixel_sel_th=0.25)
    fn = feats.reshape(-1, F)
    fn = fn / np.linalg.norm(fn, axis=1, keepdims=True)
    cn = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    cos = fn @ cn.T
    np.testing.assert_array_equal(np.asarray(hard), cos.argmax(1))
    s = np.sort(cos, axis=1)
    want_mask = (s[:, -1] - s[:, -2] > 0.25).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(mask), want_mask)


def test_thres_cb_plabel(rng):
    probs = rng.dirichlet(np.ones(C), size=(B, H, W)).astype(np.float32)
    th = np.array([0.3, 0.5, 0.5, 0.5], np.float32)
    plabel, mask = centroids.thres_cb_plabel(jnp.asarray(probs), th, C)
    conf = probs.max(-1)
    pred = probs.argmax(-1)
    want_mask = conf >= th[pred]
    np.testing.assert_array_equal(np.asarray(mask), want_mask.astype(np.float32))
    assert (np.asarray(plabel)[~want_mask] == 255).all()


def test_gene_plabel_prop(rng):
    probs = rng.dirichlet(np.ones(C), size=(2, 8, 8)).astype(np.float32)
    plabel, mask = centroids.gene_plabel_prop(jnp.asarray(probs), 0.25)
    kept = np.asarray(mask).reshape(2, -1).mean(1)
    assert (kept >= 0.25 - 1e-6).all() and (kept <= 0.5).all()
    assert (np.asarray(plabel)[np.asarray(mask) == 0] == 255).all()


def test_mask_fusion_and_accuracy(rng):
    a = rng.integers(0, 4, (4, 4)).astype(np.int32)
    b = a.copy(); b[0, 0] = (a[0, 0] + 1) % 4
    fused = np.asarray(centroids.mask_fusion(jnp.asarray(a), jnp.asarray(b)))
    assert fused[0, 0] == 255 and (fused[1:] == a[1:]).all()
    acc, prop = centroids.pseudo_label_accuracy(jnp.asarray(fused), jnp.asarray(a))
    assert float(acc) == 1.0
    assert float(prop) == pytest.approx(15 / 16)


def test_source_centroids_bootstrap_skips_ema(rng):
    """With bootstrap=True the first step adopts batch means outright (zero
    placeholder centers never enter the EMA)."""
    import jax.numpy as jnp
    from slcl_tpu.ops.centroids import source_centroids
    feats = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, size=(2, 8, 8)))
    prev = jnp.zeros((4, 16), jnp.float32)
    fresh = source_centroids(feats, labels, num_classes=4)
    booted = source_centroids(feats, labels, num_classes=4, previous=prev,
                              momentum=0.9, bootstrap=jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(booted), np.asarray(fresh), rtol=1e-6)
    ema = source_centroids(feats, labels, num_classes=4, previous=prev,
                           momentum=0.9, bootstrap=jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(ema), 0.1 * np.asarray(fresh),
                               rtol=1e-5)


def test_update_class_center_iter_bootstrap(rng):
    import jax.numpy as jnp
    from slcl_tpu.ops.centroids import update_class_center_iter
    feats = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, size=(2, 8, 8)))
    zeros = jnp.zeros((4, 16), jnp.float32)
    booted = update_class_center_iter(feats, labels, zeros, momentum=0.9,
                                      bootstrap=jnp.asarray(True))
    ema = update_class_center_iter(feats, labels, zeros, momentum=0.9)
    np.testing.assert_allclose(np.asarray(ema), 0.1 * np.asarray(booted),
                               rtol=1e-5)
