#!/usr/bin/env python
"""Serving/inference benchmark: DRUNet flagship forward on TPU.

Measures the evaluator's exact jitted inference fn (forward + argmax,
eval/evaluator.py:91-95) at the reference eval shapes — batch 32 224x224
(config.py:5 eval bs) — images/sec/chip, plus the predict-path variant with
host->device transfer pipelined per Evaluator.predict. Timing protocol per
PERF.md: async dispatch + ONE forced readback (block_until_ready returns
early on the tunneled TPU); >=6 warmup iterations.

vs_baseline denominator: P100 fp32 speed-of-light on XLA's counted FLOPs
for the same forward (the reference evaluates pure fp32, evaluator.py) —
same construction as bench.py's training bound.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

P100_FP32_FLOPS = 9.3e12


def main():
    import jax

    from slcl_tpu.utils.jaxenv import configure_jax
    configure_jax()
    import jax.numpy as jnp
    import numpy as np

    from slcl_tpu.config import Config
    from slcl_tpu.eval.evaluator import Evaluator
    from slcl_tpu.models import build_segmentor
    from slcl_tpu.train.state import create_train_state

    cfg = Config()
    cfg.method = "mpscl"
    cfg.model.backbone = "drunet"
    cfg.model.multilvl = True
    B, H = cfg.data.eval_bs, cfg.data.crop  # 32, 224

    model = build_segmentor(cfg.model)
    state, _ = create_train_state(cfg, model, sample_shape=(1, H, H, 3))
    variables = {"params": state.seg.params,
                 "batch_stats": state.seg.batch_stats}
    ev = Evaluator(model, eval_bs=B)
    infer = ev._build_infer()

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, H, H, 3)).astype(np.float32))

    compiled = jax.jit(lambda v, x: infer(v, x)).lower(variables, img).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops_per_img = float(ca["flops"]) / B
    ref_upper = P100_FP32_FLOPS / flops_per_img

    for _ in range(8):
        pred = infer(variables, img)
    _ = int(np.asarray(pred)[0, 0, 0])

    iters = int(os.environ.get("BENCH_ITERS", "60"))
    t0 = time.perf_counter()
    for _ in range(iters):
        pred = infer(variables, img)
    _ = int(np.asarray(pred)[0, 0, 0])  # full readback = serving semantics
    dt = (time.perf_counter() - t0) / iters
    img_s = B / dt

    # predict path: fresh numpy batch each iter (host->device each step),
    # deferred readback — the Evaluator.predict pipeline.
    host = [rng.normal(size=(B, H, H, 3)).astype(np.float32)
            for _ in range(8)]
    t0 = time.perf_counter()
    pending = []
    for i in range(iters):
        dev = jax.device_put(host[i % 8])
        pending.append(infer(variables, dev))
        if len(pending) > 2:
            pending.pop(0)
    _ = int(np.asarray(pending[-1])[0, 0, 0])
    dt_pred = (time.perf_counter() - t0) / iters

    # exported-artifact path (slcl_tpu.serve): the deployable StableHLO
    # artifact must not cost throughput vs the live jitted model.
    from slcl_tpu import serve
    exported = serve.export_segmentor(model, variables, crop=H)
    serve.save_artifact("/tmp/bench_infer.slclx", exported, {"bench": True})
    afn, _ = serve.load_artifact("/tmp/bench_infer.slclx")
    for _ in range(8):
        pred = afn(img)
    _ = int(np.asarray(pred)[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        pred = afn(img)
    _ = int(np.asarray(pred)[0, 0, 0])
    dt_art = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "metric": "DRUNet inference throughput (imgs/sec/chip, bs32 224x224)",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / ref_upper, 2),
        "predict_path_img_s": round(B / dt_pred, 2),
        "artifact_img_s": round(B / dt_art, 2),
        "ref_p100_speed_of_light_img_s": round(ref_upper, 2),
        "flops_per_image": flops_per_img,
    }))


if __name__ == "__main__":
    main()
