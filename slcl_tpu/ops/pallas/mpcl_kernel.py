"""Fused MPCL (margin-preserving contrastive) Pallas kernel with custom VJP.

The hot loss of the SLCL recipe (reference utils/loss.py:469-573) touches
(B*H*W, F) pixel features — ~800k rows per domain per step. The eager chain
materializes half a dozen (M, C) intermediates in HBM and stores residuals
for backward. This kernel:

  forward:  one pass over the feature rows per tile — L2-normalize, cosine
            against the (C, F) prototypes, temperature logits with row-max
            subtraction, the ArcFace-style margin branch, masked mixed
            logits, log-sum-exp — emitting only two running scalars
            (sum of sel * mean_log_prob_pos, sum of sel).
  backward: recomputes the forward tile-locally (no residuals in HBM) and
            emits d(loss)/d(feats) analytically, including the
            normalization Jacobian. Prototypes are detached in both SLCL
            call sites (Trainer_MPSCL.py:138-148), so d(centers) = 0.

Numerics: f32 throughout (feature tiles are upcast on load).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TILE = 1024  # rows per grid step


def _margin_consts(margin: float):
    return (math.cos(margin), math.sin(margin), math.cos(math.pi - margin),
            math.sin(math.pi - margin) * margin)


def _row_terms(feats, centers, labels, T, cos_m, sin_m, th, mm, easy, n_class):
    """Shared tile math -> (mean_log_prob_pos (rows, 1), softmax p (rows, C),
    cosine, fnorm, inv_norm). feats (rows, F) f32, centers (C, F) f32,
    labels (rows, 1) int32. All intermediates stay 2D (Mosaic layout rule)."""
    inv = jax.lax.rsqrt(jnp.sum(feats * feats, axis=1, keepdims=True) + 1e-24)
    fn = feats * inv
    cos = jnp.dot(fn, centers.T, preferred_element_type=jnp.float32)
    logits = cos / T
    logits = logits - jnp.max(logits, axis=1, keepdims=True)
    sine = jnp.sqrt(jnp.clip(1.0 - cos * cos, 1e-4, 1.0))
    phi = cos * cos_m - sine * sin_m
    if easy:
        phi = jnp.where(cos > 0, phi, cos)
    else:
        phi = jnp.where(cos > th, phi, cos - mm)
    phi_l = phi / T
    phi_l = phi_l - jnp.max(phi_l, axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, cos.shape, 1)
    mask = (cols == labels).astype(jnp.float32)
    mixed = logits * (1.0 - mask) + phi_l * mask
    e = jnp.exp(mixed)
    z = jnp.sum(e, axis=1, keepdims=True) + 1e-4
    log_prob = mixed - jnp.log(z)
    mlpp = jnp.sum(mask * log_prob, axis=1, keepdims=True)
    p = e / z
    return mlpp, p, mask, cos, sine, fn, inv


def _fwd_kernel(feats_ref, labels_ref, sel_ref, centers_ref, num_ref, den_ref,
                *, T, cos_m, sin_m, th, mm, easy, n_class, m_total):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        num_ref[0, 0] = 0.0
        den_ref[0, 0] = 0.0

    feats = feats_ref[:].astype(jnp.float32)
    labels = labels_ref[:]                              # (T, 1)
    sel = sel_ref[:].astype(jnp.float32)                # (T, 1)
    centers = centers_ref[:].astype(jnp.float32)
    # mask out padding rows beyond m_total
    row0 = i * feats.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (feats.shape[0], 1), 0)
    sel = sel * ((row0 + rows) < m_total).astype(jnp.float32)

    mlpp, *_ = _row_terms(feats, centers, labels, T, cos_m, sin_m, th, mm,
                          easy, n_class)
    num_ref[0, 0] += jnp.sum(sel * mlpp)
    den_ref[0, 0] += jnp.sum(sel)


def _bwd_kernel(feats_ref, labels_ref, sel_ref, centers_ref, coef_ref,
                dfeats_ref, *, T, cos_m, sin_m, th, mm, easy, n_class, m_total):
    i = pl.program_id(0)
    feats = feats_ref[:].astype(jnp.float32)
    labels = labels_ref[:]                              # (T, 1)
    sel = sel_ref[:].astype(jnp.float32)                # (T, 1)
    centers = centers_ref[:].astype(jnp.float32)
    coef = coef_ref[0, 0]  # dL/dmlpp_i scale = -(T/T_base) * g / D

    row0 = i * feats.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (feats.shape[0], 1), 0)
    sel = sel * ((row0 + rows) < m_total).astype(jnp.float32)

    mlpp, p, mask, cos, sine, fn, inv = _row_terms(
        feats, centers, labels, T, cos_m, sin_m, th, mm, easy, n_class)

    # dmlpp/dmixed = mask - p ; dmixed/dcos = ((1-mask) + mask*dphi)/T
    # margin branch: dphi/dcos = cos_m + sin_m*cos/sine (clamped sine ->
    # constant -> cos_m); off branch: phi = cos (easy) or cos - mm -> 1
    sat = jnp.logical_or(1.0 - cos * cos <= 1e-4, 1.0 - cos * cos >= 1.0)
    dphi_on = jnp.where(sat, cos_m, cos_m + sin_m * cos / sine)
    branch = cos > (0.0 if easy else th)
    dphi = jnp.where(branch, dphi_on, 1.0)
    dmixed = mask - p                                        # (rows, C)
    dcos = dmixed * ((1.0 - mask) + mask * dphi) / T
    gcos = (coef * sel) * dcos                               # (rows, C)
    # back through cos = fn @ centers.T and the row normalization
    dfn = jnp.dot(gcos, centers, preferred_element_type=jnp.float32)
    proj = jnp.sum(dfn * fn, axis=1, keepdims=True)
    dfeats_ref[:] = ((dfn - fn * proj) * inv).astype(dfeats_ref.dtype)


def _pad_rows(x, tile):
    m = x.shape[0]
    pad = (-m) % tile
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def mpcl_loss_fused(feats: Array, labels: Array, centers: Array,
                    temperature: float = 0.1, base_temperature: float = 1.0,
                    margin: float = 0.4, easy_margin: bool = False,
                    use_sel: bool = False, sel: Optional[Array] = None) -> Array:
    """Drop-in fused equivalent of losses.mpcl_loss_calc's core.

    feats: (M, F) RAW (unnormalized) f32/bf16 pixel features.
    labels: (M,) int32. centers: (C, F) L2-normalized prototypes.
    sel: optional (M,) pixel weighting; with ``use_sel`` the loss divides by
    sum(sel) + 1e-4, otherwise by M (reference loss.py:558-571).
    """
    num, den = _mpcl_fwd_sums(feats, labels, centers, temperature, margin,
                              easy_margin, use_sel, sel)
    scale = temperature / base_temperature
    return -scale * num / den


def _mpcl_fwd_sums(feats, labels, centers, T, margin, easy, use_sel, sel):
    m, f = feats.shape
    n_class = centers.shape[0]
    cos_m, sin_m, th, mm = _margin_consts(margin)
    if sel is None:
        sel = jnp.ones((m,), jnp.float32)
    feats_p = _pad_rows(feats, _TILE)
    labels_p = _pad_rows(labels.reshape(-1, 1).astype(jnp.int32), _TILE)
    sel_p = _pad_rows(sel.reshape(-1, 1).astype(jnp.float32), _TILE)
    grid = feats_p.shape[0] // _TILE

    kern = functools.partial(_fwd_kernel, T=T, cos_m=cos_m, sin_m=sin_m,
                             th=th, mm=mm, easy=easy, n_class=n_class,
                             m_total=m)
    num, den = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((centers.shape[0], f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
    )(feats_p, labels_p, sel_p, centers.astype(jnp.float32))
    num = num[0, 0]
    den = (den[0, 0] + 1e-4) if use_sel else jnp.asarray(float(m), jnp.float32)
    return num, den


def _fused_fwd(feats, labels, centers, T, base_T, margin, easy, use_sel, sel):
    num, den = _mpcl_fwd_sums(feats, labels, centers, T, margin, easy,
                              use_sel, sel)
    scale = T / base_T
    loss = -scale * num / den
    return loss, (feats, labels, centers, sel, den)


def _fused_bwd(T, base_T, margin, easy, use_sel, res, g):
    feats, labels, centers, sel, den = res
    m, f = feats.shape
    n_class = centers.shape[0]
    cos_m, sin_m, th, mm = _margin_consts(margin)
    if sel is None:
        sel_arr = jnp.ones((m,), jnp.float32)
    else:
        sel_arr = sel
    scale = T / base_T
    coef = (-scale * g / den).reshape(1, 1).astype(jnp.float32)

    feats_p = _pad_rows(feats, _TILE)
    labels_p = _pad_rows(labels.reshape(-1, 1).astype(jnp.int32), _TILE)
    sel_p = _pad_rows(sel_arr.reshape(-1, 1).astype(jnp.float32), _TILE)
    grid = feats_p.shape[0] // _TILE

    kern = functools.partial(_bwd_kernel, T=T, cos_m=cos_m, sin_m=sin_m,
                             th=th, mm=mm, easy=easy, n_class=n_class,
                             m_total=m)
    dfeats = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_class, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(feats_p.shape, feats.dtype),
    )(feats_p, labels_p, sel_p, centers.astype(jnp.float32), coef)
    dfeats = dfeats[:m]
    # centers detached at both call sites; labels/sel non-differentiable
    return dfeats, None, jnp.zeros_like(centers), None


mpcl_loss_fused.defvjp(_fused_fwd, _fused_bwd)
