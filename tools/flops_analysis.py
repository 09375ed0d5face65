#!/usr/bin/env python
"""FLOPs accounting for the SLCL (MPSCL-path) train step.

Used to anchor ``bench.py``'s ``vs_baseline`` rigorously (VERDICT round-1
"firm up the baseline"): the reference publishes no throughput numbers and
its Kaggle GPU is unavailable here, so BASELINE.md derives a *speed-of-light
upper bound* for the reference instead of a guess:

    ref_gpu_img_s_upper = GPU_peak_fp32_FLOPs / FLOPs_per_source_image

The numerator uses the fastest GPU the reference targets (Kaggle P100,
9.3 TFLOP/s fp32 — the reference trains pure fp32, no AMP anywhere in
trainer/Trainer_MPSCL.py). The denominator comes from XLA's own cost model
over OUR jitted step, which executes the same mathematical work per batch
as reference Trainer_MPSCL.train_epoch:82-295 (two DRUNet fwd+bwd at bs16
224x224, EMA centers, pseudo-labels, MPCL src+trg, entropy-map adversarial
+ two discriminator updates). Any efficiency loss in the reference (eager
torch, per-batch host syncs, unfused ops) only makes the true reference
slower than this bound, so ``vs_baseline`` computed against it is a LOWER
bound on the real speedup.

Prints JSON: flops per step / per source image, and the implied reference
upper bounds for P100 and T4.

Usage: JAX_PLATFORMS=cpu python tools/flops_analysis.py
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

P100_FP32 = 9.3e12   # Kaggle P100 peak fp32 FLOP/s
T4_FP32 = 8.1e12     # Kaggle T4 peak fp32 FLOP/s


def main():
    import jax
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
    # count in f32 so the FLOP tally matches the reference's fp32 math
    cfg.model.dtype = "float32"
    cfg.contrastive.CNR = True
    B, H = cfg.data.bs, cfg.data.crop

    model = build_segmentor(cfg.model)
    disc, disc_aux = UncertaintyDiscriminator(), UncertaintyDiscriminator()
    cents = jnp.zeros((4, cfg.model.filters), jnp.float32)
    state, txs = create_train_state(cfg, model, disc=disc, disc_aux=disc_aux,
                                    sample_shape=(1, H, H, 3), centroids=cents)
    step = build_step(cfg, model, txs, disc, disc_aux)

    rng = np.random.default_rng(0)
    batch = {"img_s": jnp.asarray(rng.normal(size=(B, H, H, 3)), jnp.float32),
             "lab_s": jnp.asarray(rng.integers(0, 4, (B, H, H)), jnp.int32),
             "img_t": jnp.asarray(rng.normal(size=(B, H, H, 3)), jnp.float32)}
    sched = {"lr": jnp.asarray(8e-4), "lr_dis": jnp.asarray(1e-4),
             "warm": jnp.asarray(1.0)}

    compiled = jax.jit(step).lower(state, batch, sched).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops_step = float(ca["flops"])
    flops_per_src_img = flops_step / B
    out = {
        "flops_per_step_bs16": flops_step,
        "flops_per_source_image": flops_per_src_img,
        "ref_gpu_img_s_upper_P100": round(P100_FP32 / flops_per_src_img, 2),
        "ref_gpu_img_s_upper_T4": round(T4_FP32 / flops_per_src_img, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
