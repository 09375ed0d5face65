#!/usr/bin/env python
"""Headline benchmark: SLCL (MPSCL-path) training throughput on TPU.

Measures the full SLCL train step at the paper's recipe shapes — DRUNet
(multilvl), batch 16 source + 16 target 224x224 images, CE+Dice seg loss,
EMA class centers, cosine pseudo-labels, MPCL source+target, CNR, entropy-map
adversarial branch with discriminator updates — end-to-end images/sec/chip.
Two modes are timed and the faster is reported: the plain per-step dispatch
and the production ``run.scan_steps`` path (K steps per dispatch via
lax.scan, slcl_tpu/train/steps.make_multi_step), which amortizes host->device
dispatch latency exactly as the trainer does.

``vs_baseline`` (BASELINE.md "Measured baseline anchors"): the reference
publishes no throughput numbers and its Kaggle GPU is not available here, so
the denominator is a SPEED-OF-LIGHT UPPER BOUND for the reference on the
fastest GPU it targets (Kaggle P100, 9.3 TFLOP/s fp32 — the reference trains
pure fp32, no AMP anywhere in trainer/): XLA's own cost model counts the
FLOPs of this exact step (same mathematical work per batch as reference
Trainer_MPSCL.train_epoch:82-295), and

    ref_upper_img_s = 9.3e12 / FLOPs_per_source_image
    vs_baseline     = measured_img_s / ref_upper_img_s

Any eager-mode/host-sync/unfused inefficiency only makes the real reference
slower than this bound, so ``vs_baseline`` is a LOWER bound on the true
speedup. A same-host measured anchor (torch reference vs this framework on
one CPU, tools/bench_reference_cpu.py) cross-checks the bound in BASELINE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

P100_FP32_FLOPS = 9.3e12  # Kaggle P100 peak fp32 (reference trains fp32)


def main():
    import jax

    from slcl_tpu.utils.jaxenv import configure_jax
    configure_jax()
    import jax.numpy as jnp
    import numpy as np

    from slcl_tpu.config import Config
    from slcl_tpu.models import UncertaintyDiscriminator, build_segmentor
    from slcl_tpu.train.state import create_train_state
    from slcl_tpu.train.steps import build_step, make_multi_step

    cfg = Config()
    cfg.method = "mpscl"
    cfg.model.backbone = "drunet"
    cfg.model.multilvl = True
    cfg.contrastive.CNR = True
    cfg.contrastive.CNR_w = 4e-5
    B, H = cfg.data.bs, cfg.data.crop  # 16, 224

    model = build_segmentor(cfg.model)
    disc = UncertaintyDiscriminator()
    disc_aux = UncertaintyDiscriminator()
    centroids = jnp.zeros((4, cfg.model.filters), jnp.float32)
    state, txs = create_train_state(cfg, model, disc=disc, disc_aux=disc_aux,
                                    sample_shape=(1, H, H, 3),
                                    centroids=centroids)
    step = build_step(cfg, model, txs, disc, disc_aux)

    rng = np.random.default_rng(0)
    batch = {
        "img_s": jnp.asarray(rng.normal(size=(B, H, H, 3)).astype(np.float32)),
        "lab_s": jnp.asarray(rng.integers(0, 4, size=(B, H, H)).astype(np.int32)),
        "img_t": jnp.asarray(rng.normal(size=(B, H, H, 3)).astype(np.float32)),
    }
    sched = {"lr": jnp.asarray(8e-4), "lr_dis": jnp.asarray(1e-4),
             "warm": jnp.asarray(1.0)}

    # FLOPs of the recipe per XLA's cost model -> reference speed-of-light
    # bound (see module docstring). Counted once, on the same jitted step.
    compiled = jax.jit(step).lower(state, batch, sched).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops_per_src_img = float(ca["flops"]) / B
    ref_upper_img_s = P100_FP32_FLOPS / flops_per_src_img

    # compile + warmup; the scalar pull is a true device sync (on the
    # tunneled TPU in this environment block_until_ready can return early,
    # so timing uses async dispatch + one forced readback at the end).
    # Several warmup steps: the first chained steps after compile pay
    # allocator warm-up and run 3-4x slower than steady state.
    for _ in range(6):
        state, metrics = step(state, batch, sched)
    _ = float(metrics["seg_s"])

    iters = int(os.environ.get("BENCH_ITERS", "50"))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, sched)
    _ = float(metrics["seg_s"])  # drain the dispatch pipeline
    dt_plain = (time.perf_counter() - t0) / iters

    # production scan path: K steps per dispatch (trainer run.scan_steps)
    K = int(os.environ.get("BENCH_SCAN_STEPS", "8"))
    multi = make_multi_step(step)
    stacked = {k: jnp.broadcast_to(v, (K,) + v.shape) for k, v in batch.items()}
    mstate, mmetrics = multi(state, stacked, sched)  # compile (donates state)
    _ = float(mmetrics["seg_s"])
    for _ in range(2):  # allocator warmup
        mstate, mmetrics = multi(mstate, stacked, sched)
    _ = float(mmetrics["seg_s"])
    scan_iters = max(1, iters // K)
    t0 = time.perf_counter()
    for _ in range(scan_iters):
        mstate, mmetrics = multi(mstate, stacked, sched)
    _ = float(mmetrics["seg_s"])
    dt_scan = (time.perf_counter() - t0) / (scan_iters * K)

    dt = min(dt_plain, dt_scan)
    img_s = B / dt

    # ---- second path: MCCL (the paper-proper soft-label + rMC method) ----
    mccl_img_s = _bench_mccl(iters=max(10, iters // 2))
    # ---- third path: MCCL+RAIN+eps (the headline co-train recipe) --------
    mcclrain_img_s = _bench_mccl(iters=max(10, iters // 2), rain=True)

    # perf-regression floors (PERF.md ablation rows: 148 MPSCL / 121 MCCL /
    # 90 MCCL+RAIN+eps src-img/s steady-state; floors are de-rated ~20% for
    # host contention — tests/test_bench_guard.py asserts them on TPU)
    print(json.dumps({
        "metric": "SLCL train throughput (src imgs/sec/chip, bs16 224x224)",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / ref_upper_img_s, 2),
        "plain_step_img_s": round(B / dt_plain, 2),
        "scan8_img_s": round(B / dt_scan, 2),
        "mccl_img_s": round(mccl_img_s, 2),
        "mcclrain_img_s": round(mcclrain_img_s, 2),
        "regression_ok": bool(img_s >= 120.0 and mccl_img_s >= 95.0
                              and mcclrain_img_s >= 72.0),
        "ref_p100_speed_of_light_img_s": round(ref_upper_img_s, 2),
        "flops_per_source_image": flops_per_src_img,
    }))


def _bench_mccl(iters: int = 25, rain: bool = False) -> float:
    """MCCL train step at the paper recipe (train_MCCL.py:35-48 presets:
    soft centroids, rMC P=2, CNR, phead, aug_counter target pairs), bs16
    224x224 — src images/sec/chip with the async-dispatch protocol.

    ``rain=True`` prices the headline co-train recipe instead
    (Trainer_MCCL.py:196-244): RAIN stylization of the source batch, the
    stylized seg branch + bottleneck consistency, and the vjp epsilon
    ascent (eps_iters=2, clip=3) on the carried sampling state. RAIN nets
    are random-init — throughput, not style quality, is being measured."""
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from slcl_tpu.config import Config, apply_recipe
    from slcl_tpu.models import build_segmentor
    from slcl_tpu.train.state import create_train_state
    from slcl_tpu.train.steps import build_step

    cfg = Config()
    cfg.method = "mccl"
    cfg = apply_recipe(cfg)
    if rain:
        cfg.rain.enabled = True
        cfg.rain.update_eps = True
        cfg.rain.eps_iters = 2
        cfg.rain.eps_clip = 3.0
    B, H = cfg.data.bs, cfg.data.crop
    model = build_segmentor(cfg.model)
    # seed (C,F) centroids exactly as the trainer does — without them the
    # step compiles a centroids=None graph that skips the EMA/bootstrap path
    state, txs = create_train_state(
        cfg, model, sample_shape=(1, H, H, 3),
        centroids=jnp.zeros((4, cfg.model.filters), jnp.float32))
    rain_model = None
    if rain:
        from slcl_tpu.models.rain import RAIN
        rain_model = RAIN()
        x0 = jnp.zeros((1, H, H, 3), jnp.float32)
        rv = rain_model.init({"params": jax.random.PRNGKey(7),
                              "noise": jax.random.PRNGKey(8)}, x0, x0)
        state = state.replace(extra={"rain": rv["params"]},
                              sampling=jnp.zeros((1, 512), jnp.float32))
    step = build_step(cfg, model, txs, None, None, rain_model=rain_model)

    rng = np.random.default_rng(1)
    batch = {
        "img_s": jnp.asarray(rng.normal(size=(B, H, H, 3)).astype(np.float32)),
        "lab_s": jnp.asarray(rng.integers(0, 4, size=(B, H, H)).astype(np.int32)),
        "img_t": jnp.asarray(rng.normal(size=(B, H, H, 3)).astype(np.float32)),
        "img_t_aug": jnp.asarray(rng.normal(size=(B, H, H, 3)).astype(np.float32)),
    }
    sched = {"lr": jnp.asarray(8e-4), "lr_dis": jnp.asarray(1e-4),
             "warm": jnp.asarray(1.0),
             # steady-state flags: sampling carried (fresh only on a
             # trainer epoch's first batch), eps ascent engaged post-warmup
             "fresh": jnp.asarray(0.0), "eps_on": jnp.asarray(1.0 if rain else 0.0)}
    for _ in range(6):
        state, metrics = step(state, batch, sched)
    _ = float(metrics["seg_s"])
    t0 = _time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, sched)
    _ = float(metrics["seg_s"])
    return B / ((_time.perf_counter() - t0) / iters)


if __name__ == "__main__":
    main()
