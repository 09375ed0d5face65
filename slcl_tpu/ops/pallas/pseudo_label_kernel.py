"""Fused pseudo-label kernel: normalize -> cosine -> argmax + top1-top2 gap.

One pass over the target feature rows (reference utils_.py:597-624 does
normalize + matmul + sort in separate HBM-materializing ops).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 1024


def _kernel(feats_ref, centers_ref, labels_ref, mask_ref, *, th):
    feats = feats_ref[:].astype(jnp.float32)
    centers = centers_ref[:].astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.sum(feats * feats, axis=1, keepdims=True) + 1e-24)
    cos = jnp.dot(feats * inv, centers.T, preferred_element_type=jnp.float32)
    am = jnp.argmax(cos, axis=1, keepdims=True)               # (T, 1)
    m1 = jnp.max(cos, axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, cos.shape, 1)
    m2 = jnp.max(jnp.where(cols == am, -jnp.inf, cos), axis=1, keepdims=True)
    labels_ref[:] = am.astype(jnp.int32)
    mask_ref[:] = ((m1 - m2) > th).astype(jnp.float32)


def pseudo_label_fused(feats: jax.Array, centers: jax.Array,
                       pixel_sel_th: float = 0.25):
    """feats (M, F) raw; centers (C, F) raw (normalized in-kernel caller-side).

    Returns (labels (M,), mask (M,)) — exact semantics of
    centroids.generate_pseudo_label.
    """
    centers = centers.astype(jnp.float32)
    centers = centers / (jnp.linalg.norm(centers, axis=-1, keepdims=True) + 1e-12)
    m, f = feats.shape
    pad = (-m) % _TILE
    feats_p = jnp.pad(feats, ((0, pad), (0, 0))) if pad else feats
    grid = feats_p.shape[0] // _TILE
    labels, mask = pl.pallas_call(
        functools.partial(_kernel, th=pixel_sel_th),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(centers.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((feats_p.shape[0], 1), jnp.int32),
                   jax.ShapeDtypeStruct((feats_p.shape[0], 1), jnp.float32)],
    )(jax.lax.stop_gradient(feats_p), centers)
    return labels[:m, 0], mask[:m, 0]
