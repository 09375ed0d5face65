#!/usr/bin/env python
"""Measure the torch reference's MPSCL training step on CPU, head-to-head
with this framework's jitted step on the same CPU.

The reference repo publishes no benchmark numbers and its GPU is unavailable
here, so BASELINE.md anchors ``vs_baseline`` with (a) this measured same-CPU
framework ratio and (b) a speed-of-light bound for the reference on its
Kaggle-class GPU (see BASELINE.md). This script drives the ACTUAL reference
modules (model/DRUNet.py, utils/loss.py, utils/utils_.py, model/GAN.py) —
imported, not copied — through one MPSCL generator+discriminator step
(Trainer_MPSCL.train_epoch:82-295 structure).

Usage: python tools/bench_reference_cpu.py [n_steps] [bs]
"""
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = "/root/reference"
sys.path.insert(0, str(REPO))

N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
BS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
H = 224


def bench_reference():
    import torch
    from unittest import mock
    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REF)
    stubs = {name: mock.MagicMock() for name in (
        "nibabel", "SimpleITK", "easydict", "torchvision",
        "torchvision.transforms", "torchvision.transforms.functional",
        "skimage", "skimage.measure", "pandas")}
    with mock.patch.dict(sys.modules, stubs):
        from model.DRUNet import Segmentation_model as RefDRUNet
        from model.GAN import UncertaintyDiscriminator
        from utils.loss import MPCL, dice_loss, loss_calc, mpcl_loss_calc
        from utils.utils_ import (generate_pseudo_label, prob_2_entropy,
                                  update_class_center_iter)

    torch.manual_seed(0)
    device = torch.device("cpu")
    seg = RefDRUNet(filters=32, n_block=4, bottleneck_depth=4, n_class=4,
                    multilvl=True)
    d_main = UncertaintyDiscriminator(4)
    d_aux = UncertaintyDiscriminator(4)
    opt = torch.optim.SGD(seg.parameters(), lr=8e-4, momentum=0.9,
                          weight_decay=5e-4)
    opt_d = torch.optim.Adam(d_main.parameters(), lr=1e-4, betas=(0.9, 0.99))
    opt_da = torch.optim.Adam(d_aux.parameters(), lr=1e-4, betas=(0.9, 0.99))
    mpcl_src = MPCL(device, num_class=4, temperature=0.1, m=0.4)
    mpcl_trg = MPCL(device, num_class=4, temperature=0.1, m=0.2)
    mse = torch.nn.MSELoss()

    img_s = torch.randn(BS, 3, H, H)
    lab_s = torch.randint(0, 4, (BS, H, H))
    img_t = torch.randn(BS, 3, H, H)
    centers = torch.randn(4, 32)
    bce = torch.nn.BCEWithLogitsLoss()

    def step():
        opt.zero_grad(); opt_d.zero_grad(); opt_da.zero_grad()
        pred_s, aux_s, ft_s = seg(img_s, features_out=True)
        pred_t, aux_t, ft_t = seg(img_t, features_out=True)
        loss_seg = loss_calc(pred_s, lab_s, device, jaccard=False) \
            + dice_loss(pred_s, lab_s)
        c = update_class_center_iter(ft_s, lab_s, centers, m=0.9)
        plab, pmask = generate_pseudo_label(ft_t, c, pixel_sel_th=0.25)
        l_src = mpcl_loss_calc(ft_s, lab_s, c, mpcl_src)
        l_trg = mpcl_loss_calc(ft_t, plab, c, mpcl_trg,
                               pixel_sel_loc=pmask, tag='target')
        ent_t = prob_2_entropy(torch.softmax(pred_t, dim=1))
        ent_ta = prob_2_entropy(torch.softmax(aux_t, dim=1))
        adv = bce(d_main(ent_t), torch.zeros_like(d_main(ent_t)))
        adv_a = bce(d_aux(ent_ta), torch.zeros_like(d_aux(ent_ta)))
        total = loss_seg + l_src + l_trg + 1e-3 * adv + 2e-4 * adv_a
        total.backward()
        opt.step()
        # D phase on detached preds (halved BCE both domains)
        ent_s = prob_2_entropy(torch.softmax(pred_s.detach(), dim=1))
        ent_t2 = prob_2_entropy(torch.softmax(pred_t.detach(), dim=1))
        dl = 0.5 * bce(d_main(ent_s), torch.zeros(1).expand_as(d_main(ent_s))) \
            + 0.5 * bce(d_main(ent_t2), torch.ones(1).expand_as(d_main(ent_t2)))
        dl.backward()
        opt_d.step()
        ent_sa = prob_2_entropy(torch.softmax(aux_s.detach(), dim=1))
        ent_ta2 = prob_2_entropy(torch.softmax(aux_t.detach(), dim=1))
        dla = 0.5 * bce(d_aux(ent_sa), torch.zeros(1).expand_as(d_aux(ent_sa))) \
            + 0.5 * bce(d_aux(ent_ta2), torch.ones(1).expand_as(d_aux(ent_ta2)))
        dla.backward()
        opt_da.step()
        return float(total.detach())

    step()  # warm-up (allocator, threading pools)
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        step()
    dt = (time.perf_counter() - t0) / N_STEPS
    return dt


def bench_ours_cpu():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from slcl_tpu.config import Config
    from slcl_tpu.models import UncertaintyDiscriminator, build_segmentor
    from slcl_tpu.train.state import create_train_state
    from slcl_tpu.train.steps import build_step

    cfg = Config()
    cfg.method = "mpscl"
    cfg.model.multilvl = True
    cfg.contrastive.CNR = True
    model = build_segmentor(cfg.model)
    disc, disc_aux = UncertaintyDiscriminator(), UncertaintyDiscriminator()
    cents = jnp.zeros((4, 32), jnp.float32)
    state, txs = create_train_state(cfg, model, disc=disc, disc_aux=disc_aux,
                                    sample_shape=(1, H, H, 3), centroids=cents)
    step = build_step(cfg, model, txs, disc, disc_aux)
    rng = np.random.default_rng(0)
    batch = {"img_s": jnp.asarray(rng.normal(size=(BS, H, H, 3)), jnp.float32),
             "lab_s": jnp.asarray(rng.integers(0, 4, (BS, H, H)), jnp.int32),
             "img_t": jnp.asarray(rng.normal(size=(BS, H, H, 3)), jnp.float32)}
    sched = {"lr": jnp.asarray(8e-4), "lr_dis": jnp.asarray(1e-4),
             "warm": jnp.asarray(1.0)}
    state, m = step(state, batch, sched)  # compile + warm-up
    jax.block_until_ready(m["seg_s"])
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        state, m = step(state, batch, sched)
    jax.block_until_ready(m["seg_s"])
    dt = (time.perf_counter() - t0) / N_STEPS
    return dt


if __name__ == "__main__":
    which = sys.argv[3] if len(sys.argv) > 3 else "both"
    out = {}
    if which in ("both", "ref"):
        dt = bench_reference()
        out["reference_torch_cpu_s_per_step"] = round(dt, 3)
        out["reference_torch_cpu_img_s"] = round(BS / dt, 3)
    if which in ("both", "ours"):
        dt = bench_ours_cpu()
        out["slcl_tpu_jax_cpu_s_per_step"] = round(dt, 3)
        out["slcl_tpu_jax_cpu_img_s"] = round(BS / dt, 3)
    import json
    print(json.dumps(out))
