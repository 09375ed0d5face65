"""Class-centroid / pseudo-label engine — the SLCL core.

Re-implements (and repairs) the reference's centroid machinery
(utils/utils_.py:479-631) in a TPU-first way: every per-class Python loop is
replaced with a one-hot matmul reduction that XLA tiles onto the MXU, and the
reversed-Monte-Carlo (rMC) partitioning — which the reference's Kaggle edit
broke (utils_.py:523/:529 reference an uninitialised list and :544-547 index a
length-1 stack) — is implemented as documented by the paper/argparse intent
("number of partitions to split decoder_ft", utils_.py:410): target pixels are
randomly assigned to P groups, one soft centroid set is estimated per group,
and downstream losses average over the P estimates.

All reductions accumulate in float32.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
_EPS = 1e-7


class CentroidResult(NamedTuple):
    centroids: Array       # (P, C, F) for partitioned target, else (C, F)
    ratio: Array           # scalar: fraction of pixels above threshold
    stddevs: Array         # (C,) mean per-class feature stddev (stdmin)


def _flatten_feats(decoder_ft: Array) -> Tuple[Array, Tuple[int, int, int]]:
    n, h, w, f = decoder_ft.shape
    return decoder_ft.astype(jnp.float32).reshape(n * h * w, f), (n, h, w)


def source_centroids(
    decoder_ft: Array,
    labels: Array,
    *,
    num_classes: int = 4,
    previous: Optional[Array] = None,
    momentum: float = 0.95,
    bootstrap: Optional[Array] = None,
) -> Array:
    """Per-class masked feature means from hard labels, with optional EMA.

    Parity: reference ``cal_centroid`` source path (utils_.py:533-540,
    :552-564): nearest-downsample labels to feature resolution, per-class mean
    ``sum(f * 1[y=k]) / (count_k + 1e-7)``, then
    ``momentum * previous + (1 - momentum) * current``.

    ``bootstrap`` (traced bool): when true, return the raw batch means and
    skip the EMA — used on the first step when ``previous`` is a zero
    placeholder rather than loaded class centers (the reference seeds its EMA
    from ``class_center_{mod}_f{fold}.npy``, Trainer_MPSCL.py:306-331; with a
    zero seed the first EMA would scale centroids by (1 - momentum) and the
    contrastive losses would see near-zero centers for many steps).

    decoder_ft: (N, H, W, F); labels: (N, H', W') int.
    Returns (C, F) float32.
    """
    feats, (n, h, w) = _flatten_feats(decoder_ft)
    if labels.shape[1:] != (h, w):
        labels = jax.image.resize(labels, (labels.shape[0], h, w), method="nearest")
    onehot = jax.nn.one_hot(labels.reshape(-1), num_classes, dtype=jnp.float32)
    sums = onehot.T @ feats                                    # (C, F)
    counts = jnp.sum(onehot, axis=0)[:, None]                  # (C, 1)
    cents = sums / (counts + _EPS)
    if previous is not None:
        ema = momentum * previous.astype(jnp.float32) + (1.0 - momentum) * cents
        cents = ema if bootstrap is None else jnp.where(bootstrap, cents, ema)
    return cents


def target_soft_centroids(
    decoder_ft: Array,
    soft_label: Array,
    *,
    partition: int = 1,
    rng: Optional[Array] = None,
    threshold: float = 0.0,
    weighted_ave: bool = True,
    num_classes: int = 4,
) -> CentroidResult:
    """Soft-labeled (and rMC-partitioned) target centroids.

    Parity + repair of reference ``cal_centroid`` pseudo-label path
    (utils_.py:503-529): bilinear-resize the soft probs to feature resolution;
    confidence mask = (max prob >= threshold) when 0 < threshold < 1;
    ``weighted_ave=True``: centroid_k = sum(p_k(x) * m(x) * f(x)) /
    (sum(p_k(x) * m(x)) + 1e-7);  ``weighted_ave=False``: hard one-hot of the
    argmax replaces p_k. Reversed Monte Carlo (``partition=P > 1``): pixels
    are uniformly assigned to P groups by ``rng`` and one centroid set is
    computed per group — P independent estimates instead of one.

    decoder_ft: (N, H, W, F); soft_label: (N, H', W', C) softmax probs.
    Returns centroids of shape (P, C, F) (P=1 included, callers iterate).
    """
    feats, (n, h, w) = _flatten_feats(decoder_ft)
    if soft_label.shape[1:3] != (h, w):
        soft_label = jax.image.resize(
            soft_label, (soft_label.shape[0], h, w, soft_label.shape[-1]),
            method="bilinear")
    probs = soft_label.astype(jnp.float32).reshape(-1, num_classes)  # (M, C)

    max_prob = jnp.max(probs, axis=-1)
    if 0.0 < threshold < 1.0:
        certain = (max_prob >= threshold).astype(jnp.float32)
    else:
        certain = jnp.ones_like(max_prob)
    ratio = jnp.mean(certain)

    if weighted_ave:
        weights = probs * certain[:, None]                     # (M, C)
    else:
        hard = jax.nn.one_hot(jnp.argmax(probs, axis=-1), num_classes,
                              dtype=jnp.float32)
        weights = hard * certain[:, None]

    if partition > 1:
        if rng is None:
            raise ValueError("rng is required when partition > 1 (rMC)")
        assign = jax.random.randint(rng, (weights.shape[0],), 0, partition)
        part_onehot = jax.nn.one_hot(assign, partition, dtype=jnp.float32)  # (M, P)
        # (P, C, M') weights per partition -> two matmul reductions
        w_pc = weights[:, None, :] * part_onehot[:, :, None]   # (M, P, C)
        w_flat = w_pc.reshape(weights.shape[0], partition * num_classes)
        sums = (w_flat.T @ feats).reshape(partition, num_classes, -1)
        counts = jnp.sum(w_flat, axis=0).reshape(partition, num_classes, 1)
        cents = sums / (counts + _EPS)
    else:
        sums = weights.T @ feats                               # (C, F)
        counts = jnp.sum(weights, axis=0)[:, None]
        cents = (sums / (counts + _EPS))[None]                 # (1, C, F)

    # per-class feature stddev around the (first-partition) centroid, for the
    # stdmin regulariser (reference kept `stddevs` as a placeholder; intent
    # per Trainer_MCCL.py:347 `w_stdmin * sum(stddev_t)`). Computed via the
    # sum-of-squares identity E[(f-c)^2] = E[f^2] - c^2 — two (C, M)x(M, F)
    # matmuls instead of materializing an (M, C, F) tensor (which at
    # 48x224^2 pixels would be ~1.2 GB and dominated the MCCL step time).
    w_total = jnp.sum(weights, axis=0)[:, None] + _EPS         # (C, 1)
    mean_sq = (weights.T @ (feats * feats)) / w_total          # (C, F)
    var = jnp.maximum(mean_sq - cents[0] * cents[0], 0.0)
    stddevs = jnp.sqrt(jnp.mean(var, axis=-1) + _EPS)          # (C,)

    return CentroidResult(cents, ratio, stddevs)


def update_class_center_iter(
    decoder_ft: Array,
    labels: Array,
    class_centers: Array,
    *,
    momentum: float = 0.9,
    num_classes: int = 4,
    bootstrap: Optional[Array] = None,
) -> Array:
    """Iteration-wise EMA of source class centers, keeping previous centers
    for classes absent from the batch.

    Parity: reference utils_.py:568-594 — features detached; per-class batch
    mean; ``center = m * prev + (1-m) * batch_mean`` with absent classes
    falling back to ``prev`` (so their EMA is a no-op... actually the
    reference substitutes the previous center as the "batch mean", giving
    ``m*prev + (1-m)*prev = prev`` — reproduced exactly).

    decoder_ft: (N, H, W, F) at label resolution; labels: (N, H, W) int.
    """
    feats, (n, h, w) = _flatten_feats(jax.lax.stop_gradient(decoder_ft))
    if labels.shape[1:] != (h, w):
        labels = jax.image.resize(labels, (labels.shape[0], h, w), method="nearest")
    onehot = jax.nn.one_hot(labels.reshape(-1), num_classes, dtype=jnp.float32)
    sums = onehot.T @ feats
    counts = jnp.sum(onehot, axis=0)[:, None]
    batch_means = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0),
                            class_centers.astype(jnp.float32))
    ema = momentum * class_centers.astype(jnp.float32) + (1.0 - momentum) * batch_means
    if bootstrap is None:
        return ema
    # first-step bootstrap when centers were zero-initialized (see
    # source_centroids): adopt the batch means outright
    return jnp.where(bootstrap, batch_means, ema)


def generate_pseudo_label(
    decoder_ft_t: Array,
    class_centers: Array,
    *,
    pixel_sel_th: float = 0.25,
) -> Tuple[Array, Array]:
    """Cosine pseudo-labels + top1-top2 gap confidence mask for target pixels.

    Parity: reference utils_.py:597-624 — L2-normalize detached features and
    centers, cosine matrix (B*H*W, C); hard label = argmax; mask = 1 where
    (top1 - top2 cosine) > threshold.

    decoder_ft_t: (N, H, W, F). Returns (labels (B*H*W,), mask (B*H*W,)).
    """
    feats = jax.lax.stop_gradient(decoder_ft_t).astype(jnp.float32)
    feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)
    f = feats.shape[-1]
    feats = feats.reshape(-1, f)
    centers = class_centers.astype(jnp.float32)
    centers = centers / (jnp.linalg.norm(centers, axis=-1, keepdims=True) + 1e-12)
    cosine = feats @ centers.T                                  # (M, C)
    top2 = jax.lax.top_k(cosine, 2)[0]
    gap = top2[:, 0] - top2[:, 1]
    mask = (gap > pixel_sel_th).astype(jnp.float32)
    hard = jnp.argmax(cosine, axis=1)
    return hard, mask


# ---------------------------------------------------------------------------
# BCL pseudo-label thresholds (reference utils_.py:1179-1296)
# ---------------------------------------------------------------------------
def thres_cb_plabel(probs: Array, thresholds: Array, num_classes: int) -> Tuple[Array, Array]:
    """Class-balanced global-threshold pseudo-labels.

    probs NHWC softmax; thresholds (C,). Pixels whose max prob is below the
    per-class threshold get label 255 (ignore). Returns (plabel NHW, mask NHW).
    """
    conf = jnp.max(probs, axis=-1)
    pred = jnp.argmax(probs, axis=-1)
    th = jnp.take(jnp.asarray(thresholds, jnp.float32), pred)
    mask = conf >= th
    plabel = jnp.where(mask, pred, 255)
    return plabel, mask.astype(jnp.float32)


def gene_plabel_prop(probs: Array, prop: float) -> Tuple[Array, Array]:
    """Local top-r% pseudo-labels: keep each image's most-confident ``prop``
    fraction of pixels, 255 elsewhere (reference gene_plabel_prop intent,
    Trainer_BCL.py:165-220 local branch). probs NHWC softmax."""
    conf = jnp.max(probs, axis=-1)                       # NHW
    pred = jnp.argmax(probs, axis=-1)
    flat = conf.reshape(conf.shape[0], -1)
    k = max(int(prop * flat.shape[1]), 1)
    kth = jnp.sort(flat, axis=1)[:, -k][:, None]
    mask = flat >= kth
    mask = mask.reshape(conf.shape)
    plabel = jnp.where(mask, pred, 255)
    return plabel, mask.astype(jnp.float32)


def mask_fusion(plabel_a: Array, plabel_b: Array) -> Array:
    """Fuse two pseudo-label maps: keep agreement, 255 on conflict/ignore
    (reference mask_fusion intent, utils_.py:1179-1296)."""
    agree = plabel_a == plabel_b
    return jnp.where(agree, plabel_a, 255)


def pseudo_label_accuracy(plabel: Array, label: Array,
                          ignore: int = 255) -> Tuple[Array, Array]:
    """(accuracy over non-ignored pixels, kept-pixel proportion) — the
    reference's Acc bookkeeping (utils_.py Acc)."""
    valid = (plabel != ignore)
    correct = jnp.logical_and(valid, plabel == label)
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    return (jnp.sum(correct) / n_valid,
            jnp.mean(valid.astype(jnp.float32)))


def gene_thres(probs_flat: Array, labels_flat: Array, prop: float,
               num_classes: int) -> Array:
    """Per-class confidence threshold keeping the top-``prop`` fraction.

    Host-side helper (numpy semantics) mirroring reference gene_thres intent
    (Trainer_BCL.py:165-220): for each class, the (1-prop) quantile of the
    max-prob values of pixels predicted as that class, capped at 0.999.
    """
    import numpy as np
    probs_flat = np.asarray(probs_flat)
    labels_flat = np.asarray(labels_flat)
    th = np.zeros((num_classes,), np.float32)
    for k in range(num_classes):
        vals = probs_flat[labels_flat == k]
        if vals.size == 0:
            th[k] = 1.0
        else:
            th[k] = min(float(np.quantile(vals, max(0.0, 1.0 - prop))), 0.999)
    return jnp.asarray(th)
