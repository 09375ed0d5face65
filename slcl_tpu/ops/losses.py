"""Segmentation / adversarial / contrastive loss library (pure jnp).

Functional re-implementations of every loss in the reference's
``utils/loss.py`` + ``utils/losses.py``, written against the *formulas*
(reference citations on each function). All functions are jit-compatible,
take logits/labels as arrays, and accumulate in float32 regardless of the
activation dtype (bf16-safe).

Layout convention: images and feature maps are NHWC (TPU-native), labels are
NHW int32, class centers are (n_class, n_feat).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-7


def _f32(x: Array) -> Array:
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Segmentation losses
# ---------------------------------------------------------------------------
def cross_entropy_loss(logits: Array, labels: Array) -> Array:
    """Mean pixel-wise CE; logits NHWC, labels NHW int.

    Parity: torch.nn.CrossEntropyLoss in reference utils/loss.py:47-66.
    """
    logits = _f32(logits)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)
    return jnp.mean(nll)


def jaccard_loss(logits: Array, labels: Array, eps: float = _EPS) -> Array:
    """Soft IoU loss over softmax probs vs one-hot labels.

    Parity: reference utils/loss.py:11-44 (multi-class branch): intersection
    and cardinality are reduced over (batch, H, W) per class, and the final
    loss is ``1 - mean_c(I_c / (U_c + eps))``.
    """
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(_f32(logits), axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    dims = tuple(range(labels.ndim))  # reduce over batch + spatial, keep class
    intersection = jnp.sum(probs * onehot, axis=dims)
    cardinality = jnp.sum(probs + onehot, axis=dims)
    union = cardinality - intersection
    return 1.0 - jnp.mean(intersection / (union + eps))


def cross_entropy_ignore(logits: Array, labels: Array,
                         ignore_index: int = 255) -> Array:
    """Mean CE over pixels whose label != ignore_index (BCL pseudo-label CE,
    reference Trainer_BCL.py:222-275 / torch ignore_index semantics)."""
    logits = _f32(logits)
    valid = (labels != ignore_index).astype(jnp.float32)
    safe = jnp.where(labels == ignore_index, 0, labels).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def loss_calc(logits: Array, labels: Array, jaccard: bool = False) -> Array:
    """CE (+ optional Jaccard): the universal seg loss (reference loss.py:47-66)."""
    loss = cross_entropy_loss(logits, labels)
    if jaccard:
        loss = loss + jaccard_loss(logits, labels)
    return loss


def dice_loss(logits: Array, labels: Array, eps: float = 1e-5) -> Array:
    """Soft squared-denominator Dice loss.

    Parity: reference utils/loss.py:69-103 — per-(batch, class) dice
    ``2*sum(p*g) / (sum(p^2) + sum(g^2) + eps)``, summed over classes, averaged
    over batch, then ``1 - total/C``.
    """
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(_f32(logits), axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    spatial = tuple(range(1, labels.ndim))  # per-sample reduce over H, W
    num = jnp.sum(probs * onehot, axis=spatial)           # (B, C)
    den1 = jnp.sum(probs * probs, axis=spatial)
    den2 = jnp.sum(onehot * onehot, axis=spatial)
    dice = 2.0 * num / (den1 + den2 + eps)                # (B, C)
    dice_total = jnp.sum(dice) / dice.shape[0]
    return 1.0 - dice_total / num_classes


def loss_entropy(probs: Array, smooth: float = 1e-7, mode: str = "mean") -> Array:
    """Normalized entropy minimisation (AdvEnt direct term).

    Parity: reference utils/loss.py:106-118 — ``-1/log(C) * sum_c p log(p)``
    per pixel; 'mean' averages over all pixels, 'sum' sums per-sample then
    averages over batch. ``probs`` NHWC (already softmaxed).
    """
    probs = _f32(probs)
    C = probs.shape[-1]
    ent = probs * jnp.log(probs + smooth)
    pix = (-1.0 / math.log(C)) * jnp.sum(ent, axis=-1)  # NHW
    if mode == "mean":
        return jnp.mean(pix)
    if mode == "sum":
        return jnp.mean(jnp.sum(pix, axis=tuple(range(1, pix.ndim))))
    raise NotImplementedError(mode)


def prob_2_entropy(probs: Array) -> Array:
    """Per-pixel weighted self-information map (AdvEnt discriminator input).

    Parity: reference utils/utils_.py:627-631 — ``-p * log2(p+eps) / log2(C)``,
    same shape as input (NHWC here).
    """
    probs = _f32(probs)
    C = probs.shape[-1]
    return -probs * jnp.log2(probs + _EPS) / math.log2(C)


def loss_class_prior(probs: Array, prior: Array, w: float) -> Array:
    """Hinge on predicted class marginals vs a prior vector.

    Parity: reference utils/loss.py:222-225 — ``sum(relu(w*prior - mean_c))``
    where mean is over (batch, H, W). ``probs`` NHWC.
    """
    marginal = jnp.mean(_f32(probs), axis=tuple(range(probs.ndim - 1)))
    return jnp.sum(jax.nn.relu(w * jnp.asarray(prior, jnp.float32) - marginal))


def bce_with_logits(logits: Array, target: Array) -> Array:
    """Mean binary cross entropy with logits (discriminator loss)."""
    logits = _f32(logits)
    target = jnp.broadcast_to(jnp.asarray(target, jnp.float32), logits.shape)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def mse_loss(a: Array, b: Array) -> Array:
    return jnp.mean((_f32(a) - _f32(b)) ** 2)


# ---------------------------------------------------------------------------
# Centroid contrastive loss (MCCL / SLCL proper)
# ---------------------------------------------------------------------------
def centroid_contrastive_loss(
    centroid_s: Array,
    centroid_t: Array,
    *,
    bg: bool = False,
    split: bool = False,
    norm: bool = True,
    tau: Optional[float] = None,
) -> Array:
    """Inter/intra centroid InfoNCE between two (n_class, n_feat) centroid sets.

    Parity: reference utils/loss.py:233-275 (``ContrastiveLoss.forward``).
    For each anchor class i (foreground rows 1..C-1 unless ``bg``):
      nom   = exp(<t_i, s_i>) + exp(<t_i, t_i>)
      denom = sum_j exp(<t_i, s_j>) + sum_j exp(<t_i, t_j>)
      loss_i = -log(nom / (denom + eps));  loss = sum_i loss_i
    ``split`` halves the nominator into two -log terms (loss.py:268-270).

    NOTE: the executed vectorized reference path applies **no temperature**
    (loss.py:264-265); the legacy loop (loss.py:250-263) divides by tau. We
    default to the executed behaviour (``tau=None``); pass ``tau`` to enable
    the legacy scaling.
    """
    centroid_s = _f32(centroid_s)
    centroid_t = _f32(centroid_t)
    n_class = centroid_s.shape[0]
    if norm:
        centroid_s = centroid_s / (_safe_norm(centroid_s) + _EPS)
        centroid_t = centroid_t / (_safe_norm(centroid_t) + _EPS)
    sim_st = centroid_t @ centroid_s.T
    sim_tt = centroid_t @ centroid_t.T
    if tau is not None:
        sim_st = sim_st / tau
        sim_tt = sim_tt / tau
    exp_st = jnp.exp(sim_st)
    exp_tt = jnp.exp(sim_tt)
    start = 0 if bg else 1
    diag_st = jnp.diagonal(exp_st)[start:]
    diag_tt = jnp.diagonal(exp_tt)[start:]
    denom = jnp.sum(exp_st[start:], axis=1) + jnp.sum(exp_tt[start:], axis=1)
    if split:
        logit = 0.5 * (-jnp.log(diag_st / (denom + _EPS))
                       - jnp.log(diag_tt / (denom + _EPS)))
    else:
        logit = -jnp.log((diag_st + diag_tt) / (denom + _EPS))
    del n_class
    return jnp.sum(logit)


def _safe_norm(x: Array, axis: int = 1, tiny: float = 1e-12) -> Array:
    """L2 norm with a finite gradient at exactly-zero vectors (a class with
    no confident pixels yields an all-zero centroid; torch/jnp norm both
    produce NaN gradients there — the reference inherits that hazard)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return jnp.sqrt(jnp.maximum(sq, tiny * tiny))


def cnr_loss(centroid_s: Array, centroid_t: Array) -> Array:
    """Centroid-Norm Regulariser: MSE between per-class centroid L2 norms.

    Parity: reference Trainer_MCCL.py:303-315.
    """
    norm_s = _safe_norm(_f32(centroid_s))[:, 0]
    norm_t = _safe_norm(_f32(centroid_t))[:, 0]
    return jnp.mean((norm_t - norm_s) ** 2)


# ---------------------------------------------------------------------------
# Margin-Preserving Contrastive Loss (MPSCL)
# ---------------------------------------------------------------------------
def mpcl_loss(
    features: Array,
    labels: Array,
    class_centers: Array,
    *,
    temperature: float = 0.07,
    base_temperature: float = 0.07,
    margin: float = 0.5,
    easy_margin: bool = False,
    pixel_sel_loc: Optional[Array] = None,
    num_classes: int = 4,
) -> Array:
    """Margin-preserving pixel-vs-prototype contrastive loss.

    Parity: reference utils/loss.py:469-573 (``MPCL.forward``); inputs here
    are already flattened/normalized as in ``mpcl_loss_calc``:
      features: (N, F) L2-normalized pixel features (N = B*H*W)
      labels:   (N,) int class labels
      class_centers: (C, F) L2-normalized prototypes
      pixel_sel_loc: optional (N,) weighting mask (target branch)

    Formula: cosine = f @ centers.T; logits = cos/T, max-subtracted;
    sine = sqrt(clamp(1-cos^2, 1e-4, 1)); phi = cos(a+m) via angle addition,
    with hard-margin fallback ``where(cos > cos(pi-m), phi, cos - sin(pi-m)*m)``
    (or easy: ``where(cos > 0, phi, cos)``); phi_logits = phi/T, max-subtracted;
    the positive-class column uses phi_logits, negatives use logits;
    loss = -(T/T_base) * mean/weighted-mean of sum(mask * log_prob).
    """
    features = _f32(features)
    class_centers = _f32(class_centers)
    cos_m = math.cos(margin)
    sin_m = math.sin(margin)
    th = math.cos(math.pi - margin)
    mm = math.sin(math.pi - margin) * margin

    cosine = features @ class_centers.T                      # (N, C)
    logits = cosine / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))

    sine = jnp.sqrt(jnp.clip(1.0 - cosine ** 2, 1e-4, 1.0))
    phi = cosine * cos_m - sine * sin_m
    if easy_margin:
        phi = jnp.where(cosine > 0, phi, cosine)
    else:
        phi = jnp.where(cosine > th, phi, cosine - mm)
    phi_logits = phi / temperature
    phi_logits = phi_logits - jax.lax.stop_gradient(
        jnp.max(phi_logits, axis=1, keepdims=True))

    mask = jax.nn.one_hot(labels.astype(jnp.int32), num_classes, dtype=jnp.float32)
    mixed = logits * (1.0 - mask) + phi_logits * mask        # (N, C)
    exp_logits = jnp.exp(mixed)
    log_prob = mixed - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True) + 1e-4)
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1)     # (N,)

    scale = temperature / base_temperature
    if pixel_sel_loc is not None:
        sel = _f32(pixel_sel_loc).reshape(-1)
        loss = -scale * jnp.sum(sel * mean_log_prob_pos) / (jnp.sum(sel) + 1e-4)
    else:
        loss = -scale * jnp.mean(mean_log_prob_pos)
    return loss


def mpcl_loss_calc(
    feats: Array,
    labels: Array,
    class_centers: Array,
    *,
    temperature: float = 0.1,
    base_temperature: float = 1.0,
    margin: float = 0.4,
    easy_margin: bool = False,
    pixel_sel_loc: Optional[Array] = None,
    resize_labels: bool = True,
) -> Array:
    """Normalize + flatten wrapper around :func:`mpcl_loss`.

    Parity: reference utils/loss.py:576-605 — channel-L2-normalize the feature
    map, nearest-resize hard labels to the feature resolution (source branch),
    flatten to (B*H*W, F) and call MPCL.

    feats NHWC, labels NHW (hard, int) or already flattened (N,).
    """
    n, h, w, c = feats.shape
    feats = _f32(feats)
    feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)
    feats = feats.reshape(n * h * w, c)
    if resize_labels and labels.ndim == 3 and labels.shape[1:] != (h, w):
        labels = nearest_resize_labels(labels, (h, w))
    labels = labels.reshape(-1)
    centers = _f32(class_centers)
    centers = centers / (jnp.linalg.norm(centers, axis=-1, keepdims=True) + 1e-12)
    return mpcl_loss(
        feats, labels, centers,
        temperature=temperature, base_temperature=base_temperature,
        margin=margin, easy_margin=easy_margin,
        pixel_sel_loc=pixel_sel_loc, num_classes=centers.shape[0],
    )


def nearest_resize_labels(labels: Array, size: Tuple[int, int]) -> Array:
    """Nearest-neighbour resize of NHW integer labels (static shapes)."""
    h, w = size
    return jax.image.resize(labels, (labels.shape[0], h, w), method="nearest")


# ---------------------------------------------------------------------------
# Pixel-level supervised contrastive (SupCon / Local / Block)
# ---------------------------------------------------------------------------
def supcon_loss(
    features: Array,
    labels: Optional[Array] = None,
    *,
    temperature: float = 0.07,
) -> Array:
    """Supervised contrastive loss over pixel features from multiple views.

    Parity: reference utils/loss.py:315-387 (``SupConLoss``): features
    (B, V, H, W, F) pre-normalized pixel embeddings, labels (B, V, H, W).
    The reference's conv2d-as-dot-product trick is replaced by a plain
    matmul — identical math, MXU-friendly.
    """
    b, v = features.shape[0], features.shape[1]
    f = features.shape[-1]
    feats = _f32(features).transpose(1, 0, 2, 3, 4).reshape(-1, f)  # (V*B*H*W, F)
    n = feats.shape[0]
    logits = (feats @ feats.T) / temperature                        # (n, n)

    if labels is not None:
        lab = labels.transpose(1, 0, 2, 3).reshape(-1, 1)
        mask = jnp.equal(lab, lab.T).astype(jnp.float32)
        non_bg = (lab.reshape(-1) != 0).astype(jnp.float32)
    else:
        hw = n // (b * v)
        eye = jnp.eye(b * hw, dtype=jnp.float32)
        mask = jnp.tile(eye, (v, v))
        non_bg = None

    logits_mask = 1.0 - jnp.eye(n, dtype=jnp.float32)
    mask = mask * logits_mask
    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / jnp.maximum(
        jnp.sum(mask, axis=1), 1e-12)
    loss = -mean_log_prob_pos
    if non_bg is not None:
        return jnp.sum(loss * non_bg) / jnp.maximum(jnp.sum(non_bg), 1e-12)
    return jnp.mean(loss)


def local_con_loss(features, labels=None, *, temperature=0.7, stride=4):
    """Strided subsample wrapper (reference utils/loss.py:390-413)."""
    feats = features[:, :, ::stride, ::stride, :]
    labs = None if labels is None else labels[:, :, ::stride, ::stride]
    return supcon_loss(feats, labs, temperature=temperature)


def block_con_loss(features, labels=None, *, temperature=0.7, block_size=32):
    """SupCon over non-overlapping spatial tiles, averaged over non-empty
    tiles (reference utils/loss.py:416-466). features (B, V, H, W, F)."""
    h = features.shape[2]
    div = h // block_size
    losses_, weights = [], []
    for i in range(div):
        for j in range(div):
            fb = features[:, :, i * block_size:(i + 1) * block_size,
                          j * block_size:(j + 1) * block_size, :]
            if labels is not None:
                lb = labels[:, :, i * block_size:(i + 1) * block_size,
                            j * block_size:(j + 1) * block_size]
                nonzero = (jnp.sum(lb) > 0).astype(jnp.float32)
                losses_.append(supcon_loss(fb, lb, temperature=temperature)
                               * nonzero)
                weights.append(nonzero)
            else:
                losses_.append(supcon_loss(fb, temperature=temperature))
                weights.append(jnp.asarray(1.0))
    total = sum(losses_)
    denom = sum(weights)
    return jnp.where(denom > 0, total / jnp.maximum(denom, 1.0), 0.0)


def interpolated_supcon_loss(features: Array, labels_a: Array, labels_b: Array,
                             lam: float, *, temperature: float = 0.07) -> Array:
    """Mixup-style supervised contrastive loss: the positive mask is the
    lam-weighted blend of both label sets' equality masks (reference
    utils/losses.py:6-68 intent). features (N, F) normalized; labels (N,)."""
    feats = _f32(features)
    logits = (feats @ feats.T) / temperature
    la = labels_a.reshape(-1, 1)
    lb = labels_b.reshape(-1, 1)
    mask = (lam * jnp.equal(la, la.T).astype(jnp.float32)
            + (1.0 - lam) * jnp.equal(lb, lb.T).astype(jnp.float32))
    n = feats.shape[0]
    logits_mask = 1.0 - jnp.eye(n, dtype=jnp.float32)
    mask = mask * logits_mask
    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))
    mlpp = jnp.sum(mask * log_prob, axis=1) / jnp.maximum(
        jnp.sum(mask, axis=1), 1e-12)
    return -jnp.mean(mlpp)


# ---------------------------------------------------------------------------
# BCL losses
# ---------------------------------------------------------------------------
def bcl_entropy_loss(logits: Array) -> Array:
    """BCL's (double-softmax) entropy map (reference utils/loss.py:121-130).

    Returns per-pixel entropy NHW. The reference applies softmax then
    log_softmax *of the probabilities* — reproduced faithfully.
    """
    p = jax.nn.softmax(_f32(logits), axis=-1)
    log_p = jax.nn.log_softmax(p, axis=-1)
    return -jnp.sum(p * log_p, axis=-1)


def bcl_prototype_similarity(
    feature: Array, label_small: Array, feature2: Array, num_classes: int,
) -> Array:
    """Class prototypes of domain-1 vs pixel features of domain-2, cosine x10.

    Parity: reference utils/loss.py:133-165 (``cosine_similarity_BCL``) with
    the per-class Python loop replaced by a masked segment mean. Classes
    absent from ``label_small`` produce zero prototypes; their similarity
    rows are set to -1 (x10 after scaling) as in the reference.
    feature/feature2: (h, w, F); label_small: (h, w) int with 255 = ignore.
    """
    h, w, f = feature.shape
    lab = label_small.reshape(-1)
    feat = _f32(feature).reshape(-1, f)
    onehot = jax.nn.one_hot(jnp.where(lab == 255, num_classes, lab),
                            num_classes + 1, dtype=jnp.float32)[:, :num_classes]
    counts = jnp.sum(onehot, axis=0)                           # (C,)
    protos = (onehot.T @ feat) / jnp.maximum(counts[:, None], 1.0)
    protos = jnp.where(counts[:, None] > 0, protos, 0.0)
    protos_n = protos / (jnp.linalg.norm(protos, axis=1, keepdims=True) + 1e-12)
    feat2 = _f32(feature2).reshape(-1, f)
    feat2_n = feat2 / (jnp.linalg.norm(feat2, axis=0, keepdims=True) + 1e-12)
    cs = protos_n @ feat2_n.T                                  # (C, h*w)
    cs = jnp.where(cs == 0, -1.0, cs)
    return (cs * 10.0).reshape(num_classes, h, w)


# ---------------------------------------------------------------------------
# Chamfer distance (AdaptEvery point clouds)
# ---------------------------------------------------------------------------
def batch_pairwise_dist(x: Array, y: Array) -> Array:
    """Squared pairwise distances between two point sets (B, N, D)/(B, M, D).

    Parity: reference utils/loss.py:608-620.
    """
    x = _f32(x)
    y = _f32(y)
    xx = jnp.sum(x * x, axis=-1)[:, :, None]
    yy = jnp.sum(y * y, axis=-1)[:, None, :]
    zz = jnp.einsum("bnd,bmd->bnm", x, y)
    return jnp.clip(xx + yy - 2.0 * zz, 0.0, None)


def chamfer_loss(x: Array, y: Array, smooth: float = 1e-7) -> Array:
    """Symmetric nearest-neighbour (Chamfer) loss.

    Parity: reference utils/loss.py:623-635 (``batch_NN_loss``).
    """
    d = jnp.sqrt(batch_pairwise_dist(x, y) + smooth)
    a = jnp.mean(jnp.min(d, axis=2), axis=1)
    b = jnp.mean(jnp.min(d, axis=1), axis=1)
    return jnp.mean(a) + jnp.mean(b)


# ---------------------------------------------------------------------------
# Soft-target CE / interpolation SCL (utils/losses.py extras)
# ---------------------------------------------------------------------------
def softmax_cross_entropy_soft(logits: Array, soft_targets: Array) -> Array:
    """CE against soft targets (reference utils/losses.py:70-92)."""
    logp = jax.nn.log_softmax(_f32(logits), axis=-1)
    return jnp.mean(jnp.sum(-_f32(soft_targets) * logp, axis=-1))


def seg_pseudo_loss(probs_t: Array, threshold: float, num_classes: int) -> Array:
    """Calibrated self-training entropy term on confident target pixels.

    Parity: reference Trainer_MCCL.py:260-267 — calibrate probs by C/e, take
    ``-p_detached * log(p)`` masked by max-prob > threshold, mean.
    """
    p = _f32(probs_t)
    calibrated = p * num_classes / math.e
    loss = -jax.lax.stop_gradient(calibrated) * jnp.log(calibrated)
    mask = (jnp.max(p, axis=-1, keepdims=True) > threshold).astype(jnp.float32)
    return jnp.mean(loss * mask)
