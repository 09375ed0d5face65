"""Measure the Pallas kernels against their XLA-fused jnp oracles.

Produces the PERF.md "Pallas kernels vs XLA fusion" table rows at the
recipe shape (M = 16*224*224 pixels, F = 32 decoder features, C = 4
classes). Run on the real TPU:

    python tools/bench_pallas.py [--iters 50]

Timing follows bench.py's pattern: dispatch `iters` async steps, then
drain with one scalar readback (jax.block_until_ready can return early on
the tunneled TPU).
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from slcl_tpu.ops import centroids, losses
from slcl_tpu.ops.pallas import (
    mpcl_loss_fused,
    mpcl_pseudo_fused,
    pseudo_label_fused,
    soft_centroids_fused,
)

B, H, W, F, C = 16, 224, 224, 32, 4
M = B * H * W


def _time_fn(fn, *args, iters: int = 50) -> float:
    """Mean ms/call: warmup, then async dispatch + one scalar readback."""
    out = fn(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    kf, kc, kl, kp, ka = jax.random.split(key, 5)
    feats4 = jax.random.normal(kf, (B, H, W, F), jnp.float32)
    feats2 = feats4.reshape(M, F)
    centers = jax.random.normal(kc, (C, F), jnp.float32)
    centers_n = centers / jnp.linalg.norm(centers, axis=-1, keepdims=True)
    labels = jax.random.randint(kl, (M,), 0, C)
    probs = jax.nn.softmax(jax.random.normal(kp, (M, C), jnp.float32))
    assign = jax.random.randint(ka, (M,), 0, 2)

    rows = []

    # -- MPCL value+grad ----------------------------------------------------
    jnp_vg = jax.jit(jax.value_and_grad(
        lambda f: losses.mpcl_loss_calc(
            f, labels.reshape(B, H, W), centers_n, margin=0.4,
            resize_labels=False)))
    pal_vg = jax.jit(jax.value_and_grad(
        lambda f: mpcl_loss_fused(f.reshape(M, F), labels, centers_n,
                                  margin=0.4)))
    rows.append(("MPCL value+grad",
                 _time_fn(pal_vg, feats4, iters=args.iters),
                 _time_fn(jnp_vg, feats4, iters=args.iters)))

    # -- pseudo-label (cos + top2 gap) -------------------------------------
    jnp_pl = jax.jit(lambda f: centroids.generate_pseudo_label(
        f, centers_n, pixel_sel_th=0.25))
    pal_pl = jax.jit(lambda f: pseudo_label_fused(
        f.reshape(M, F), centers_n, pixel_sel_th=0.25))
    rows.append(("pseudo-label (cos + top2 gap)",
                 _time_fn(pal_pl, feats4, iters=args.iters),
                 _time_fn(jnp_pl, feats4, iters=args.iters)))

    # -- rMC soft centroids (P=2) ------------------------------------------
    # (jnp side draws its own rMC assignment from rng — same math, same
    # shapes; assignment draw is part of the measured work on both sides
    # in training, so keep the comparison at the call-site level.)
    jnp_sc = jax.jit(lambda f, p: centroids.target_soft_centroids(
        f, p.reshape(B, H, W, C), partition=2, rng=ka, num_classes=C))
    pal_sc = jax.jit(lambda f, p: soft_centroids_fused(
        f.reshape(M, F), p, assign, partition=2, num_classes=C))
    rows.append(("rMC soft centroids (P=2)",
                 _time_fn(pal_sc, feats4, probs, iters=args.iters),
                 _time_fn(jnp_sc, feats4, probs, iters=args.iters)))

    # -- v3: fused pseudo-label + target MPCL value+grad -------------------
    def jnp_v3(f):
        lab, sel = centroids.generate_pseudo_label(f, centers_n,
                                                   pixel_sel_th=0.25)
        return losses.mpcl_loss_calc(
            f, lab.reshape(B, H, W), centers_n, margin=0.2,
            pixel_sel_loc=sel, resize_labels=False)

    jnp_v3_vg = jax.jit(jax.value_and_grad(jnp_v3))
    pal_v3_vg = jax.jit(jax.value_and_grad(
        lambda f: mpcl_pseudo_fused(f.reshape(M, F), centers_n, 0.1, 1.0,
                                    0.2, False, 0.25)))
    # numerics check before timing
    v_j, g_j = jnp_v3_vg(feats4)
    v_p, g_p = pal_v3_vg(feats4)
    rel = abs(float(v_j) - float(v_p)) / max(abs(float(v_j)), 1e-9)
    grel = float(jnp.linalg.norm(g_j - g_p) / (jnp.linalg.norm(g_j) + 1e-12))
    print(f"[v3 parity] value rel err {rel:.2e}  grad rel err {grel:.2e}")
    rows.append(("v3 fused pseudo+MPCL value+grad",
                 _time_fn(pal_v3_vg, feats4, iters=args.iters),
                 _time_fn(jnp_v3_vg, feats4, iters=args.iters)))

    dev = jax.devices()[0].platform
    print(f"\nbackend={dev}  M={M}  F={F}  C={C}  iters={args.iters}")
    print(f"{'op':<36}{'pallas ms':>12}{'jnp ms':>12}")
    for name, tp, tj in rows:
        print(f"{name:<36}{tp:>12.2f}{tj:>12.2f}")


if __name__ == "__main__":
    main()
