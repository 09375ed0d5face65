"""Fused pseudo-label + target-MPCL Pallas kernel (the round-3 'v3' attempt).

The MPSCL target branch runs two passes over the (M, F) target features:
``centroids.generate_pseudo_label`` (normalize -> cosine -> argmax +
top1-top2 gap mask, reference utils_.py:597-624) and then
``losses.mpcl_loss_calc`` on those labels (margin softmax, reference
utils/loss.py:529-573). This kernel computes BOTH in one tile pass — the
(M, C) cosine matrix is built once in VMEM, the hard label / confidence
mask are derived in-register, and only the two running loss scalars leave
the kernel. Backward recomputes tile-locally; the pseudo-labels and mask
are selections (non-differentiable), matching the reference's detached
pseudo-labels.

Status: measured SLOWER than the XLA-fused jnp composition at the recipe
shape (see PERF.md, Pallas table) — kept as a tested experiment, not the
default path, same as the other kernels in this package.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TILE = 1024


def _margin_consts(margin: float):
    return (math.cos(margin), math.sin(margin), math.cos(math.pi - margin),
            math.sin(math.pi - margin) * margin)


def _tile_terms(feats, centers, T, cos_m, sin_m, th, mm, easy, pixel_sel_th):
    """One-pass tile math: normalize, cosine, in-register pseudo-labels
    (first-occurrence argmax) + top1-top2 gap mask, margin softmax.

    Returns (mlpp (rows,1), sel (rows,1), p, mask, cos, sine, fn, inv)."""
    inv = jax.lax.rsqrt(jnp.sum(feats * feats, axis=1, keepdims=True) + 1e-24)
    fn = feats * inv
    cos = jnp.dot(fn, centers.T, preferred_element_type=jnp.float32)
    n_class = cos.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, cos.shape, 1)

    # pseudo-label: first-occurrence argmax + top2 gap (utils_.py:603-622)
    mx = jnp.max(cos, axis=1, keepdims=True)
    label = jnp.min(jnp.where(cos >= mx, cols, n_class), axis=1, keepdims=True)
    mask = (cols == label).astype(jnp.float32)
    second = jnp.max(jnp.where(mask > 0, -1e9, cos), axis=1, keepdims=True)
    sel = ((mx - second) > pixel_sel_th).astype(jnp.float32)

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
    mixed = logits * (1.0 - mask) + phi_l * mask
    e = jnp.exp(mixed)
    z = jnp.sum(e, axis=1, keepdims=True) + 1e-4
    log_prob = mixed - jnp.log(z)
    mlpp = jnp.sum(mask * log_prob, axis=1, keepdims=True)
    p = e / z
    return mlpp, sel, p, mask, cos, sine, fn, inv


def _fwd_kernel(feats_ref, centers_ref, num_ref, den_ref,
                *, T, cos_m, sin_m, th, mm, easy, pixel_sel_th, m_total):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        num_ref[0, 0] = 0.0
        den_ref[0, 0] = 0.0

    feats = feats_ref[:].astype(jnp.float32)
    centers = centers_ref[:].astype(jnp.float32)
    row0 = i * feats.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (feats.shape[0], 1), 0)
    valid = ((row0 + rows) < m_total).astype(jnp.float32)

    mlpp, sel, *_ = _tile_terms(feats, centers, T, cos_m, sin_m, th, mm,
                                easy, pixel_sel_th)
    sel = sel * valid
    num_ref[0, 0] += jnp.sum(sel * mlpp)
    den_ref[0, 0] += jnp.sum(sel)


def _bwd_kernel(feats_ref, centers_ref, coef_ref, dfeats_ref,
                *, T, cos_m, sin_m, th, mm, easy, pixel_sel_th, m_total):
    i = pl.program_id(0)
    feats = feats_ref[:].astype(jnp.float32)
    centers = centers_ref[:].astype(jnp.float32)
    coef = coef_ref[0, 0]

    row0 = i * feats.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (feats.shape[0], 1), 0)
    valid = ((row0 + rows) < m_total).astype(jnp.float32)

    mlpp, sel, p, mask, cos, sine, fn, inv = _tile_terms(
        feats, centers, T, cos_m, sin_m, th, mm, easy, pixel_sel_th)
    sel = sel * valid

    sat = jnp.logical_or(1.0 - cos * cos <= 1e-4, 1.0 - cos * cos >= 1.0)
    dphi_on = jnp.where(sat, cos_m, cos_m + sin_m * cos / sine)
    branch = cos > (0.0 if easy else th)
    dphi = jnp.where(branch, dphi_on, 1.0)
    dmixed = mask - p
    dcos = dmixed * ((1.0 - mask) + mask * dphi) / T
    gcos = (coef * sel) * dcos
    dfn = jnp.dot(gcos, centers, preferred_element_type=jnp.float32)
    proj = jnp.sum(dfn * fn, axis=1, keepdims=True)
    dfeats_ref[:] = ((dfn - fn * proj) * inv).astype(dfeats_ref.dtype)


def _pad_rows(x, tile):
    pad = (-x.shape[0]) % tile
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x


def _sums(feats, centers, T, margin, easy, pixel_sel_th):
    m, f = feats.shape
    cos_m, sin_m, th, mm = _margin_consts(margin)
    feats_p = _pad_rows(feats, _TILE)
    grid = feats_p.shape[0] // _TILE
    kern = functools.partial(_fwd_kernel, T=T, cos_m=cos_m, sin_m=sin_m,
                             th=th, mm=mm, easy=easy,
                             pixel_sel_th=pixel_sel_th, m_total=m)
    num, den = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((centers.shape[0], f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
    )(feats_p, centers.astype(jnp.float32))
    return num[0, 0], den[0, 0] + 1e-4


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def mpcl_pseudo_fused(feats: Array, centers: Array,
                      temperature: float = 0.1, base_temperature: float = 1.0,
                      margin: float = 0.2, easy_margin: bool = False,
                      pixel_sel_th: float = 0.25) -> Array:
    """Fused target-branch MPCL: pseudo-labels + gap mask + margin softmax
    in one pass. feats (M, F) raw features; centers (C, F) L2-normalized.

    Equivalent jnp composition:
        lab, sel = centroids.generate_pseudo_label(feats_nhwc, centers, ...)
        losses.mpcl_loss_calc(feats_nhwc, lab, centers, margin=...,
                              pixel_sel_loc=sel, resize_labels=False)
    """
    num, den = _sums(feats, centers, temperature, margin, easy_margin,
                     pixel_sel_th)
    return -(temperature / base_temperature) * num / den


def _f_fwd(feats, centers, T, base_T, margin, easy, pixel_sel_th):
    num, den = _sums(feats, centers, T, margin, easy, pixel_sel_th)
    loss = -(T / base_T) * num / den
    return loss, (feats, centers, den)


def _f_bwd(T, base_T, margin, easy, pixel_sel_th, res, g):
    feats, centers, den = res
    m, f = feats.shape
    cos_m, sin_m, th, mm = _margin_consts(margin)
    coef = (-(T / base_T) * g / den).reshape(1, 1).astype(jnp.float32)
    feats_p = _pad_rows(feats, _TILE)
    grid = feats_p.shape[0] // _TILE
    kern = functools.partial(_bwd_kernel, T=T, cos_m=cos_m, sin_m=sin_m,
                             th=th, mm=mm, easy=easy,
                             pixel_sel_th=pixel_sel_th, m_total=m)
    dfeats = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((centers.shape[0], f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(feats_p.shape, feats.dtype),
    )(feats_p, centers.astype(jnp.float32), coef)
    return dfeats[:m], jnp.zeros_like(centers)


mpcl_pseudo_fused.defvjp(_f_fwd, _f_bwd)
