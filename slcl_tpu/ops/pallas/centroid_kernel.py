"""Single-pass rMC soft-centroid accumulation kernel.

The repaired reversed-Monte-Carlo path (ops.centroids.target_soft_centroids)
materializes an (M, P, C) weight tensor before its matmul reduction. This
kernel streams the feature rows once, computing the confidence mask, the
soft/hard class weights, and the per-partition masking in VMEM, and
accumulates (P*C, F) weighted sums + (P*C,) weight totals + the certain-pixel
count across grid steps. The partition assignment is passed in (generated
with jax.random outside) so results are reproducible and testable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 1024


def _kernel(feats_ref, probs_ref, assign_ref, sums_ref, counts_ref,
            ratio_ref, *, P, C, threshold, weighted, m_total):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        sums_ref[:] = jnp.zeros_like(sums_ref)
        counts_ref[:] = jnp.zeros_like(counts_ref)
        ratio_ref[0, 0] = 0.0

    feats = feats_ref[:].astype(jnp.float32)          # (T, F)
    probs = probs_ref[:].astype(jnp.float32)          # (T, C)
    assign = assign_ref[:]                            # (T, 1)

    row0 = i * feats.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (feats.shape[0], 1), 0)
    valid = ((row0 + rows) < m_total).astype(jnp.float32)  # (T, 1)

    max_prob = jnp.max(probs, axis=1, keepdims=True)        # (T, 1)
    if 0.0 < threshold < 1.0:
        certain = (max_prob >= threshold).astype(jnp.float32) * valid
    else:
        certain = valid
    ratio_ref[0, 0] += jnp.sum(certain)

    if weighted:
        w = probs * certain                            # (T, C)
    else:
        cols = jax.lax.broadcasted_iota(jnp.int32, probs.shape, 1)
        hard = (cols == jnp.argmax(probs, axis=1, keepdims=True))
        w = hard.astype(jnp.float32) * certain

    # per-partition masked accumulation: one small matmul per partition
    for p in range(P):
        pm = (assign == p).astype(jnp.float32)            # (T, 1)
        wp = w * pm                                       # (T, C)
        sums_ref[p * C:(p + 1) * C, :] += jnp.dot(
            wp.T, feats, preferred_element_type=jnp.float32)
        counts_ref[p * C:(p + 1) * C, :] += jnp.sum(wp, axis=0, keepdims=True).T


def soft_centroids_fused(feats: jax.Array, probs: jax.Array,
                         assign: jax.Array, *, partition: int = 1,
                         threshold: float = 0.0, weighted_ave: bool = True,
                         num_classes: int = 4):
    """feats (M, F); probs (M, C) softmax; assign (M,) int32 in [0, P).

    Returns (centroids (P, C, F), ratio scalar). Differentiable w.r.t. feats
    and probs via the jnp epilogue? No — the kernel is forward-only; use it
    inside stop-gradient contexts or wrap with custom VJP at the call site.
    (The SLCL recipes backprop through centroids, so the jnp path stays the
    default in training; this kernel serves inference/eval and the CNR path.)
    """
    m, f = feats.shape
    P, C = partition, num_classes
    pad = (-m) % _TILE
    if pad:
        feats = jnp.pad(feats, ((0, pad), (0, 0)))
        probs = jnp.pad(probs, ((0, pad), (0, 0)))
        assign = jnp.pad(assign, (0, pad))
    grid = feats.shape[0] // _TILE
    kern = functools.partial(_kernel, P=P, C=C, threshold=float(threshold),
                             weighted=weighted_ave, m_total=m)
    sums, counts, ratio = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((P * C, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P * C, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((P * C, f), jnp.float32),
                   jax.ShapeDtypeStruct((P * C, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
    )(feats, probs, assign.reshape(-1, 1).astype(jnp.int32))
    cents = (sums / (counts + 1e-7)).reshape(P, C, f)
    return cents, ratio[0, 0] / m
