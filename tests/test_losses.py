"""Parity tests: jnp loss library vs independent torch/numpy oracles of the
reference formulas (reference utils/loss.py — cited per test)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from slcl_tpu.ops import losses

B, H, W, C = 2, 8, 8, 4
FEAT = 16


def _rand_logits(rng, shape=(B, H, W, C)):
    return rng.normal(size=shape).astype(np.float32)


def _rand_labels(rng, shape=(B, H, W), c=C):
    return rng.integers(0, c, size=shape).astype(np.int32)


def test_cross_entropy_matches_torch(rng):
    logits = _rand_logits(rng)
    labels = _rand_labels(rng)
    got = float(losses.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    # torch CE wants NCHW
    want = float(F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long()))
    assert got == pytest.approx(want, rel=1e-5)


def test_jaccard_loss_matches_formula(rng):
    """Reference utils/loss.py:11-44: 1 - mean_c(I_c / (U_c + eps))."""
    logits = _rand_logits(rng)
    labels = _rand_labels(rng)
    probs = torch.softmax(torch.from_numpy(logits), dim=-1).numpy()
    onehot = np.eye(C, dtype=np.float32)[labels]
    inter = (probs * onehot).sum(axis=(0, 1, 2))
    card = (probs + onehot).sum(axis=(0, 1, 2))
    want = 1.0 - float(np.mean(inter / (card - inter + 1e-7)))
    got = float(losses.jaccard_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert got == pytest.approx(want, rel=1e-5)


def test_dice_loss_matches_formula(rng):
    """Reference utils/loss.py:69-103 (squared-denominator soft dice)."""
    logits = _rand_logits(rng)
    labels = _rand_labels(rng)
    probs = torch.softmax(torch.from_numpy(logits), dim=-1).numpy()
    onehot = np.eye(C, dtype=np.float32)[labels]
    num = (probs * onehot).sum(axis=(1, 2))
    den = (probs ** 2).sum(axis=(1, 2)) + (onehot ** 2).sum(axis=(1, 2))
    dice = 2.0 * num / (den + 1e-5)
    want = 1.0 - float(dice.sum() / B) / C
    got = float(losses.dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert got == pytest.approx(want, rel=1e-5)


def test_loss_entropy_matches_formula(rng):
    """Reference utils/loss.py:106-118."""
    logits = _rand_logits(rng)
    probs = torch.softmax(torch.from_numpy(logits), dim=-1).numpy()
    pix = (-1.0 / math.log(C)) * (probs * np.log(probs + 1e-7)).sum(-1)
    assert float(losses.loss_entropy(jnp.asarray(probs))) == pytest.approx(
        float(pix.mean()), rel=1e-5)
    assert float(losses.loss_entropy(jnp.asarray(probs), mode="sum")) == pytest.approx(
        float(pix.reshape(B, -1).sum(1).mean()), rel=1e-5)


def test_prob_2_entropy_matches_formula(rng):
    probs = torch.softmax(torch.from_numpy(_rand_logits(rng)), -1).numpy()
    want = -probs * np.log2(probs + 1e-7) / np.log2(C)
    got = np.asarray(losses.prob_2_entropy(jnp.asarray(probs)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_class_prior_matches_formula(rng):
    probs = torch.softmax(torch.from_numpy(_rand_logits(rng)), -1).numpy()
    prior = np.array([0.9146, 0.0253, 0.0309, 0.0292], np.float32)
    marg = probs.mean(axis=(0, 1, 2))
    want = float(np.maximum(1.0 * prior - marg, 0).sum())
    got = float(losses.loss_class_prior(jnp.asarray(probs), prior, 1.0))
    assert got == pytest.approx(want, rel=1e-5)


def test_bce_with_logits_matches_torch(rng):
    logits = rng.normal(size=(B, 5, 5, 1)).astype(np.float32)
    for target in (0.0, 1.0):
        got = float(losses.bce_with_logits(jnp.asarray(logits), target))
        want = float(F.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.full((B, 5, 5, 1), target)))
        assert got == pytest.approx(want, rel=1e-5)


def test_centroid_contrastive_matches_formula(rng):
    """Reference utils/loss.py:241-275 (executed vectorized path, no tau)."""
    cs = rng.normal(size=(C, FEAT)).astype(np.float32)
    ct = rng.normal(size=(C, FEAT)).astype(np.float32)

    def oracle(cs, ct, bg, split):
        csn = cs / (np.linalg.norm(cs, axis=1, keepdims=True) + 1e-7)
        ctn = ct / (np.linalg.norm(ct, axis=1, keepdims=True) + 1e-7)
        e_st = np.exp(ctn @ csn.T)
        e_tt = np.exp(ctn @ ctn.T)
        s = 0 if bg else 1
        denom = e_st[s:].sum(1) + e_tt[s:].sum(1)
        d_st = np.diagonal(e_st)[s:]
        d_tt = np.diagonal(e_tt)[s:]
        if split:
            lg = 0.5 * (-np.log(d_st / (denom + 1e-7)) - np.log(d_tt / (denom + 1e-7)))
        else:
            lg = -np.log((d_st + d_tt) / (denom + 1e-7))
        return float(lg.sum())

    for bg in (False, True):
        for split in (False, True):
            got = float(losses.centroid_contrastive_loss(
                jnp.asarray(cs), jnp.asarray(ct), bg=bg, split=split))
            assert got == pytest.approx(oracle(cs, ct, bg, split), rel=1e-5), (bg, split)


def test_cnr_loss(rng):
    cs = rng.normal(size=(C, FEAT)).astype(np.float32)
    ct = rng.normal(size=(C, FEAT)).astype(np.float32)
    want = float(np.mean((np.linalg.norm(ct, axis=1) - np.linalg.norm(cs, axis=1)) ** 2))
    assert float(losses.cnr_loss(jnp.asarray(cs), jnp.asarray(ct))) == pytest.approx(
        want, rel=1e-5)


def _mpcl_oracle(feats, labels, centers_t, T, base_T, m, easy, sel=None):
    """Torch oracle of reference utils/loss.py:469-573 (MPCL.forward),
    written independently from the formula description."""
    feats = torch.from_numpy(feats)          # (N, F), normalized
    centers = torch.from_numpy(centers_t)    # (F, C), normalized
    cos = feats @ centers
    logits = cos / T
    logits = logits - logits.max(dim=1, keepdim=True).values
    sine = torch.sqrt((1.0 - cos ** 2).clamp(1e-4, 1.0))
    phi = cos * math.cos(m) - sine * math.sin(m)
    if easy:
        phi = torch.where(cos > 0, phi, cos)
    else:
        phi = torch.where(cos > math.cos(math.pi - m), phi,
                          cos - math.sin(math.pi - m) * m)
    phi_l = phi / T
    phi_l = phi_l - phi_l.max(dim=1, keepdim=True).values
    mask = F.one_hot(torch.from_numpy(labels).long(), C).float()
    mixed = logits * (1 - mask) + phi_l * mask
    log_prob = mixed - torch.log(torch.exp(mixed).sum(1, keepdim=True) + 1e-4)
    mlpp = (mask * log_prob).sum(1)
    if sel is not None:
        selt = torch.from_numpy(sel)
        return float(-(T / base_T) * (selt * mlpp).sum() / (selt.sum() + 1e-4))
    return float((-(T / base_T) * mlpp).mean())


@pytest.mark.parametrize("easy", [False, True])
@pytest.mark.parametrize("sel", [False, True])
def test_mpcl_loss_matches_oracle(rng, easy, sel):
    n = 64
    feats = rng.normal(size=(n, FEAT)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    centers = rng.normal(size=(C, FEAT)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, C, size=(n,)).astype(np.int32)
    selmask = rng.integers(0, 2, size=(n,)).astype(np.float32) if sel else None
    T, base_T, m = 0.1, 1.0, 0.4
    want = _mpcl_oracle(feats, labels, centers.T, T, base_T, m, easy, selmask)
    got = float(losses.mpcl_loss(
        jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(centers),
        temperature=T, base_temperature=base_T, margin=m, easy_margin=easy,
        pixel_sel_loc=None if selmask is None else jnp.asarray(selmask),
        num_classes=C))
    assert got == pytest.approx(want, rel=1e-4)


def test_mpcl_loss_calc_normalizes_and_resizes(rng):
    feats = rng.normal(size=(B, H, W, FEAT)).astype(np.float32)
    labels = _rand_labels(rng, (B, 2 * H, 2 * W))
    centers = rng.normal(size=(C, FEAT)).astype(np.float32)
    out = losses.mpcl_loss_calc(
        jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(centers),
        temperature=0.1, base_temperature=1.0, margin=0.4)
    assert np.isfinite(float(out))


def test_chamfer_matches_brute_force(rng):
    x = rng.normal(size=(2, 20, 3)).astype(np.float32)
    y = rng.normal(size=(2, 25, 3)).astype(np.float32)
    d = np.linalg.norm(x[:, :, None, :] - y[:, None, :, :], axis=-1)
    d = np.sqrt(d ** 2 + 1e-7)
    want = float(d.min(2).mean(1).mean() + d.min(1).mean(1).mean())
    got = float(losses.chamfer_loss(jnp.asarray(x), jnp.asarray(y)))
    assert got == pytest.approx(want, rel=1e-4)


def test_supcon_loss_finite(rng):
    feats = rng.normal(size=(1, 2, 6, 6, FEAT)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    labels = _rand_labels(rng, (1, 2, 6, 6))
    out = float(losses.supcon_loss(jnp.asarray(feats), jnp.asarray(labels)))
    assert np.isfinite(out)
    out_unsup = float(losses.supcon_loss(jnp.asarray(feats)))
    assert np.isfinite(out_unsup)


def test_seg_pseudo_loss_matches_formula(rng):
    logits = _rand_logits(rng)
    p = torch.softmax(torch.from_numpy(logits), -1).numpy()
    cal = p * C / math.e
    raw = -cal * np.log(cal)
    mask = (p.max(-1, keepdims=True) > 0.5).astype(np.float32)
    want = float((raw * mask).mean())
    got = float(losses.seg_pseudo_loss(jnp.asarray(p), 0.5, C))
    assert got == pytest.approx(want, rel=1e-5)


def test_block_con_loss_finite(rng):
    feats = rng.normal(size=(1, 2, 8, 8, FEAT)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    labels = _rand_labels(rng, (1, 2, 8, 8))
    out = float(losses.block_con_loss(jnp.asarray(feats), jnp.asarray(labels),
                                      block_size=4))
    assert np.isfinite(out)
    # empty-label tiles are excluded; all-zero labels -> 0
    zeros = jnp.zeros((1, 2, 8, 8), jnp.int32)
    assert float(losses.block_con_loss(jnp.asarray(feats), zeros,
                                       block_size=4)) == 0.0


def test_interpolated_supcon(rng):
    feats = rng.normal(size=(16, FEAT)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    la = rng.integers(0, 4, 16).astype(np.int32)
    lb = rng.integers(0, 4, 16).astype(np.int32)
    v1 = float(losses.interpolated_supcon_loss(jnp.asarray(feats),
                                               jnp.asarray(la), jnp.asarray(lb), 1.0))
    v_pure = float(losses.interpolated_supcon_loss(jnp.asarray(feats),
                                                   jnp.asarray(la), jnp.asarray(la), 0.3))
    assert np.isfinite(v1) and np.isfinite(v_pure)
