#!/usr/bin/env python
"""Headline benchmark: SLCL (MPSCL-path) training throughput on TPU.

Measures the full SLCL train step at the paper's recipe shapes — DRUNet
(multilvl), batch 16 source + 16 target 224x224 images, CE+Dice seg loss,
EMA class centers, cosine pseudo-labels, MPCL source+target, CNR, entropy-map
adversarial branch with discriminator updates — end-to-end images/sec/chip.

Baseline: the reference publishes no numbers (BASELINE.md); the reference
recipe runs on Kaggle T4/P100-class GPUs. ``REFERENCE_GPU_IMG_S`` is the
documented estimate of the PyTorch reference's step throughput on that
hardware (two 224x224 DRUNet forward+backward passes + discriminator steps
per batch at bs16, with per-batch host syncs): ~25 source-images/sec.
``vs_baseline`` = measured / estimate; the ≥5x target is from BASELINE.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

REFERENCE_GPU_IMG_S = 25.0


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from slcl_tpu.config import Config
    from slcl_tpu.models import UncertaintyDiscriminator, build_segmentor
    from slcl_tpu.train.state import create_train_state
    from slcl_tpu.train.steps import build_step

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
    dt = (time.perf_counter() - t0) / iters

    img_s = B / dt
    print(json.dumps({
        "metric": "SLCL train throughput (src imgs/sec/chip, bs16 224x224)",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / REFERENCE_GPU_IMG_S, 2),
    }))


if __name__ == "__main__":
    main()
