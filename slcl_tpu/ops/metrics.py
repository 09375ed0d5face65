"""Segmentation metrics: on-device Dice, host-side HD95/ASSD, KLC postproc.

Replaces the reference's medpy/skimage dependencies (reference metric.py:1-71,
utils/utils_.py:91-124) with native implementations:
  * per-class binary Dice — jnp, batched, stays on device during training
  * HD95 / ASD / ASSD — surface-distance metrics via scipy.ndimage EDT,
    numerically matching medpy's definitions (distance from each border voxel
    of one mask to the nearest border voxel of the other; hd95 = 95th
    percentile of both directed distance sets combined; assd = mean of both
    sets combined; asd = mean of the forward set)
  * keep-largest-connected-component — scipy.ndimage.label replacement for
    skimage.measure (reference utils_.py:91-124)
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

Array = jax.Array


# ---------------------------------------------------------------------------
# On-device Dice
# ---------------------------------------------------------------------------
def dice_coef_per_class(pred: Array, gt: Array, num_classes: int = 4) -> Array:
    """Per-class binary Dice over the full array (classes 0..C-1).

    pred/gt: integer label maps of identical shape. Returns (C,) float32 with
    NaN where both masks are empty (medpy `dc` returns 0 there; the evaluator
    handles empties explicitly like reference metric.py:39-70).
    """
    p = jax.nn.one_hot(pred.reshape(-1), num_classes, dtype=jnp.float32)
    g = jax.nn.one_hot(gt.reshape(-1), num_classes, dtype=jnp.float32)
    inter = jnp.sum(p * g, axis=0)
    denom = jnp.sum(p, axis=0) + jnp.sum(g, axis=0)
    return jnp.where(denom > 0, 2.0 * inter / denom, 0.0)


# ---------------------------------------------------------------------------
# Surface distances (host, numpy/scipy — medpy parity)
# ---------------------------------------------------------------------------
def _border_voxels(mask: np.ndarray) -> np.ndarray:
    """Binary border = mask minus its erosion (medpy __surface_distances)."""
    mask = mask.astype(bool)
    struct = ndimage.generate_binary_structure(mask.ndim, 1)
    eroded = ndimage.binary_erosion(mask, structure=struct, border_value=0)
    return mask & ~eroded


def _normalize_spacing(spacing, ndim: int) -> np.ndarray:
    """medpy voxelspacing semantics: None -> isotropic 1, scalar -> broadcast,
    sequence must match rank (trailing dims kept when longer, e.g. a 2D slice
    evaluated with a stored 3D spacing)."""
    if spacing is None:
        return np.ones(ndim)
    arr = np.atleast_1d(np.asarray(spacing, dtype=np.float64))
    if arr.size == 1:
        return np.full(ndim, float(arr[0]))
    if arr.size > ndim:
        return arr[-ndim:]
    if arr.size < ndim:
        return np.concatenate([np.ones(ndim - arr.size), arr])
    return arr


def _directed_surface_distances(a: np.ndarray, b: np.ndarray,
                                spacing: Sequence[float]) -> np.ndarray:
    """Distances from each border voxel of `a` to the nearest border of `b`."""
    spacing = _normalize_spacing(spacing, a.ndim)
    border_a = _border_voxels(a)
    border_b = _border_voxels(b)
    if not border_a.any() or not border_b.any():
        return np.array([np.inf])
    dt = ndimage.distance_transform_edt(~border_b, sampling=spacing)
    return dt[border_a]


def hd95(gt: np.ndarray, pred: np.ndarray,
         spacing: Sequence[float] = None) -> float:
    """95th-percentile symmetric Hausdorff distance (medpy.hd95 parity)."""
    d1 = _directed_surface_distances(gt, pred, spacing)
    d2 = _directed_surface_distances(pred, gt, spacing)
    return float(np.percentile(np.hstack([d1, d2]), 95))


def hd(gt: np.ndarray, pred: np.ndarray,
       spacing: Sequence[float] = None) -> float:
    """Max symmetric Hausdorff distance (medpy.hd parity)."""
    d1 = _directed_surface_distances(gt, pred, spacing)
    d2 = _directed_surface_distances(pred, gt, spacing)
    return float(max(d1.max(), d2.max()))


def asd(gt: np.ndarray, pred: np.ndarray,
        spacing: Sequence[float] = None) -> float:
    """Average (directed) surface distance gt->pred (medpy.asd parity)."""
    return float(_directed_surface_distances(gt, pred, spacing).mean())


def assd(gt: np.ndarray, pred: np.ndarray,
         spacing: Sequence[float] = None) -> float:
    """Average symmetric surface distance (medpy.assd parity).

    medpy defines assd as the mean of the two *directed means*
    (``mean((asd(a, b), asd(b, a)))``), NOT the mean over the pooled
    distance multiset — the two differ whenever the border voxel counts
    differ. hd95, by contrast, pools before taking the percentile.
    """
    d1 = _directed_surface_distances(gt, pred, spacing)
    d2 = _directed_surface_distances(pred, gt, spacing)
    return float((d1.mean() + d2.mean()) / 2.0)


def dc(gt: np.ndarray, pred: np.ndarray) -> float:
    """Binary Dice coefficient (medpy.dc parity: 0 when both empty)."""
    gt = gt.astype(bool)
    pred = pred.astype(bool)
    denom = gt.sum() + pred.sum()
    if denom == 0:
        return 0.0
    return float(2.0 * np.logical_and(gt, pred).sum() / denom)


def metrics_per_class(
    img_gt: np.ndarray,
    img_pred: np.ndarray,
    *,
    apply_hd: bool = False,
    apply_asd: bool = False,
    class_ids: Sequence[int] = (1, 2, 3),
    ifhd95: bool = True,
    spacing: Sequence[float] = None,
) -> Dict[int, Tuple[float, float, float]]:
    """Per-foreground-class (dice, hd, assd) with centre-pixel fallback for
    empty masks.

    Parity: reference metric.py:39-71 — empty GT or prediction masks get a
    single centre pixel before surface metrics (the reference's safeguard
    against medpy erroring on empty inputs); hd/assd default to the image
    width when surface metrics are disabled.
    """
    res = {}
    for c in class_ids:
        gt_c = (img_gt == c).astype(np.uint8)
        pr_c = (img_pred == c).astype(np.uint8)
        dice = dc(gt_c, pr_c)
        h_d = a_sd = float(img_gt.shape[-1])
        if apply_hd or apply_asd:
            if gt_c.sum() == 0:
                centre = tuple(s // 2 for s in gt_c.shape)
                gt_c[centre] = 1
            if pr_c.sum() == 0:
                centre = tuple(s // 2 for s in pr_c.shape)
                pr_c[centre] = 1
            if apply_hd:
                h_d = hd95(gt_c, pr_c, spacing) if ifhd95 else hd(gt_c, pr_c, spacing)
            if apply_asd:
                a_sd = assd(gt_c, pr_c, spacing)
        res[c] = (dice, h_d, a_sd)
    return res


# ---------------------------------------------------------------------------
# Keep-largest-connected-component postprocessing
# ---------------------------------------------------------------------------
def keep_largest_connected_components(segmentation: np.ndarray,
                                      class_ids: Sequence[int] = (1, 2, 3)) -> np.ndarray:
    """Zero out all but the largest connected component per foreground class.

    Parity: reference utils/utils_.py:91-124 (skimage.measure.label based);
    rebuilt on scipy.ndimage.label.
    """
    out = np.zeros_like(segmentation)
    for c in class_ids:
        binary = segmentation == c
        if not binary.any():
            continue
        labeled, n = ndimage.label(binary)
        if n == 0:
            continue
        sizes = ndimage.sum_labels(binary, labeled, index=np.arange(1, n + 1))
        largest = 1 + int(np.argmax(sizes))
        out[labeled == largest] = c
    return out
