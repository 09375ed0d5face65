"""Tests for native Dice / HD95 / ASSD / KLC (medpy & skimage replacements)."""
import jax.numpy as jnp
import numpy as np
import pytest

from slcl_tpu.ops import metrics


def test_dc_basic():
    gt = np.zeros((8, 8), np.uint8)
    pred = np.zeros((8, 8), np.uint8)
    gt[2:6, 2:6] = 1
    pred[3:7, 3:7] = 1
    inter = np.logical_and(gt, pred).sum()
    want = 2 * inter / (gt.sum() + pred.sum())
    assert metrics.dc(gt, pred) == pytest.approx(want)
    assert metrics.dc(np.zeros((4, 4)), np.zeros((4, 4))) == 0.0


def test_dice_per_class_device_matches_host(rng):
    gt = rng.integers(0, 4, size=(16, 16)).astype(np.int32)
    pred = rng.integers(0, 4, size=(16, 16)).astype(np.int32)
    dev = np.asarray(metrics.dice_coef_per_class(jnp.asarray(pred), jnp.asarray(gt)))
    for c in range(4):
        want = metrics.dc(gt == c, pred == c)
        assert dev[c] == pytest.approx(want, abs=1e-6)


def test_surface_distance_identical_masks_zero():
    m = np.zeros((16, 16), np.uint8)
    m[4:10, 5:11] = 1
    assert metrics.hd95(m, m) == 0.0
    assert metrics.assd(m, m) == 0.0
    assert metrics.asd(m, m) == 0.0


def test_hd95_known_shift():
    """Two 1-pixel-wide vertical lines 5 apart: all border distances = 5."""
    a = np.zeros((16, 16), np.uint8)
    b = np.zeros((16, 16), np.uint8)
    a[4:12, 3] = 1
    b[4:12, 8] = 1
    assert metrics.hd95(a, b) == pytest.approx(5.0)
    assert metrics.assd(a, b) == pytest.approx(5.0)
    assert metrics.hd(a, b) == pytest.approx(5.0)


def test_hd95_voxelspacing():
    a = np.zeros((16, 16), np.uint8)
    b = np.zeros((16, 16), np.uint8)
    a[4:12, 3] = 1
    b[4:12, 8] = 1
    assert metrics.hd95(a, b, spacing=(1.0, 2.0)) == pytest.approx(10.0)


def test_metrics_per_class_fallback_and_values(rng):
    gt = np.zeros((32, 32), np.int64)
    pred = np.zeros((32, 32), np.int64)
    gt[4:12, 4:12] = 1      # class 1 present in gt only
    pred[4:12, 4:12] = 2    # class 2 present in pred only
    res = metrics.metrics_per_class(gt, pred, apply_hd=True, apply_asd=True)
    assert res[1][0] == 0.0 and res[2][0] == 0.0
    assert np.isfinite(res[1][1]) and np.isfinite(res[3][2])  # centre fallback
    # perfect class
    gt2 = gt.copy(); pred2 = gt.copy()
    res2 = metrics.metrics_per_class(gt2, pred2, apply_hd=True, apply_asd=True)
    assert res2[1][0] == 1.0 and res2[1][1] == 0.0 and res2[1][2] == 0.0


def test_keep_largest_connected_components():
    seg = np.zeros((20, 20), np.int64)
    seg[1:3, 1:3] = 1      # small blob class 1
    seg[10:18, 10:18] = 1  # big blob class 1
    seg[5, 5] = 2          # single-pixel class 2
    out = metrics.keep_largest_connected_components(seg)
    assert (out[1:3, 1:3] == 0).all()
    assert (out[10:18, 10:18] == 1).all()
    assert out[5, 5] == 2
