"""Training steps for the remaining UDA baselines: DDFSeg, AdaptEvery, BCL.

  ddfseg     — reference Trainer_DDFSeg.train_epoch (:290-465): DDFNet
               (disentangled dual-stream CycleGAN) + SegDecoder generator
               update against three PatchGAN discriminators (target-image,
               source-image with aux head, seg-prediction), then the three
               discriminator updates on detached tensors.
  adaptevery — reference Trainer_AdaptEvery.train_epoch (:195-470):
               multilvl AdaptSeg + AdvEnt-entropy D + PointNet discriminator
               on predicted point clouds + Chamfer loss on source vertices.
  bcl        — reference Trainer_BCL.train_epoch (:222-275): CE(src) +
               lambda_t * CE(trg pseudo-labels, ignore 255) + entropy +
               bidirectional prototype metric loss; pseudo-labels are
               regenerated per self-training round by the trainer
               (gene_thres / gene_plabel_prop semantics in ops.centroids).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..ops import losses as L
from .state import NetState, TrainState
from .steps import _apply_seg, _d_acc

Array = jax.Array


def _adam_update(tx, net: NetState, grads, lr):
    net.opt_state.hyperparams["learning_rate"] = lr
    updates, new_opt = tx.update(grads, net.opt_state, net.params)
    return NetState(params=optax.apply_updates(net.params, updates),
                    batch_stats=net.batch_stats, opt_state=new_opt)


# ---------------------------------------------------------------------------
# DDFSeg
# ---------------------------------------------------------------------------
def make_ddfseg_step(cfg, ddfnet, segdecoder, d_s, d_t, d_seg, txs) -> Callable:
    """state.seg = (ddfnet + segdecoder) params packed as
    {'ddfnet': ..., 'segdecoder': ...}; d_main/d_aux/extra['d_seg'] hold the
    three discriminators. Weights from cfg.ddfseg (reference defaults,
    Trainer_DDFSeg.py:25-36)."""
    dd = cfg.ddfseg
    w_seg, w_cyc, w_zero = dd.w_seg, dd.w_cyc, dd.w_zero
    w_adv_t, w_adv_s, w_adv_aux, w_adv_seg = (dd.w_adv_t, dd.w_adv_s,
                                              dd.w_adv_aux, dd.w_adv_seg)

    @jax.jit
    def step(state: TrainState, batch: Dict[str, Array], sched: Dict[str, Array]):
        rng, rng_do = jax.random.split(state.rng)
        img_s, labels_s, img_t = batch["img_s"], batch["lab_s"], batch["img_t"]
        d_seg_net = state.extra["d_seg"]

        def gen_loss(params):
            variables = {"params": params["ddfnet"]}
            if state.seg.batch_stats:
                variables["batch_stats"] = state.seg.batch_stats["ddfnet"]
            ddf_out, upd = ddfnet.apply(variables, img_s, img_t, True,
                                        rngs={"dropout": rng_do},
                                        mutable=["batch_stats"])
            seg_vars = {"params": params["segdecoder"]}
            pred_s = segdecoder.apply(seg_vars, ddf_out["content_s"], True,
                                      rngs={"dropout": rng_do})
            pred_recon_s = segdecoder.apply(seg_vars, ddf_out["recon_content_s"],
                                            True, rngs={"dropout": rng_do})
            pred_t = segdecoder.apply(seg_vars, ddf_out["content_t"], True,
                                      rngs={"dropout": rng_do})

            seg_loss = (L.cross_entropy_loss(pred_s, labels_s)
                        + L.dice_loss(pred_s, labels_s))
            recon_seg_loss = (L.cross_entropy_loss(pred_recon_s, labels_s)
                              + L.dice_loss(pred_recon_s, labels_s))
            zero_s = jnp.mean(ddf_out["style_s_from_t"].astype(jnp.float32) ** 2)
            zero_t = jnp.mean(ddf_out["style_t_from_s"].astype(jnp.float32) ** 2)
            cyc_s = L.mse_loss(ddf_out["recon_imgs"], img_s[..., 1:2])
            cyc_t = L.mse_loss(ddf_out["recon_imgt"], img_t[..., 1:2])

            adv_t = L.bce_with_logits(
                d_t.apply({"params": state.d_main.params},
                          ddf_out["fake_img_s_t"]), 1.0)
            adv_seg = L.bce_with_logits(
                d_seg.apply({"params": d_seg_net.params},
                            jax.lax.stop_gradient(pred_t)), 1.0)
            d_s_out, d_s_aux = d_s.apply({"params": state.d_aux.params},
                                         ddf_out["fake_img_t_s"])
            adv_s = L.bce_with_logits(d_s_out, 1.0)
            adv_s_aux = L.bce_with_logits(d_s_aux, 1.0)

            total = (w_seg * (seg_loss + recon_seg_loss)
                     + w_cyc * (cyc_s + cyc_t) + w_zero * (zero_s + zero_t)
                     + w_adv_t * adv_t + w_adv_seg * adv_seg
                     + w_adv_s * adv_s + w_adv_aux * adv_s_aux)
            metrics = {"seg_s": seg_loss, "seg_fake_st": recon_seg_loss,
                       "cyc_loss_s": cyc_s, "cyc_loss_t": cyc_t,
                       "zero_loss_s": zero_s, "zero_loss_t": zero_t,
                       "loss_adv_t": adv_t, "loss_adv_s": adv_s,
                       "loss_adv_seg": adv_seg}
            outs = {"fake_st": ddf_out["fake_img_s_t"],
                    "fake_ts": ddf_out["fake_img_t_s"],
                    "recon_s": ddf_out["recon_imgs"],
                    "pred_t": pred_t, "pred_recon_s": pred_recon_s,
                    "bs": upd["batch_stats"]}
            return total, (metrics, outs)

        grads, (metrics, outs) = jax.grad(gen_loss, has_aux=True)(state.seg.params)
        new_bs = dict(state.seg.batch_stats)
        new_bs["ddfnet"] = outs["bs"]
        seg = _adam_update(txs["seg"], state.seg.replace(batch_stats=new_bs),
                           grads, sched["lr"])

        # ---- discriminators on detached tensors ----
        fake_st = jax.lax.stop_gradient(outs["fake_st"])
        fake_ts = jax.lax.stop_gradient(outs["fake_ts"])
        recon_s = jax.lax.stop_gradient(outs["recon_s"])
        pred_t = jax.lax.stop_gradient(outs["pred_t"])
        pred_recon_s = jax.lax.stop_gradient(outs["pred_recon_s"])

        def d_t_loss(p):
            real = d_t.apply({"params": p}, img_t[..., 1:2])
            fake = d_t.apply({"params": p}, fake_st)
            return (0.5 * L.bce_with_logits(real, 1.0)
                    + 0.5 * L.bce_with_logits(fake, 0.0)), (real, fake)

        def d_s_loss(p):
            real, _ = d_s.apply({"params": p}, img_s[..., 1:2])
            _, recon_aux = d_s.apply({"params": p}, recon_s)
            fake, fake_aux = d_s.apply({"params": p}, fake_ts)
            loss = (0.5 * L.bce_with_logits(real, 1.0)
                    + 0.5 * L.bce_with_logits(recon_aux, 1.0)
                    + 0.5 * L.bce_with_logits(fake, 0.0)
                    + 0.5 * L.bce_with_logits(fake_aux, 0.0))
            return loss, (real, fake)

        def d_seg_loss(p):
            real = d_seg.apply({"params": p}, pred_recon_s)
            fake = d_seg.apply({"params": p}, pred_t)
            return (0.5 * L.bce_with_logits(real, 1.0)
                    + 0.5 * L.bce_with_logits(fake, 0.0)), (real, fake)

        g_t, (rt, ft) = jax.grad(d_t_loss, has_aux=True)(state.d_main.params)
        g_s, (rs, fs) = jax.grad(d_s_loss, has_aux=True)(state.d_aux.params)
        g_seg, _ = jax.grad(d_seg_loss, has_aux=True)(d_seg_net.params)
        new_d_t = _adam_update(txs["d_main"], state.d_main, g_t, sched["lr_dis"])
        new_d_s = _adam_update(txs["d_aux"], state.d_aux, g_s, sched["lr_dis"])
        new_d_seg = _adam_update(txs["d_seg"], d_seg_net, g_seg, sched["lr_dis"])

        metrics.update({"d_t_acc_real": _d_acc(rt, True),
                        "d_t_acc_fake": _d_acc(ft, False),
                        "d_s_acc_real": _d_acc(rs, True),
                        "d_s_acc_fake": _d_acc(fs, False)})
        new_state = state.replace(step=state.step + 1, rng=rng, seg=seg,
                                  d_main=new_d_t, d_aux=new_d_s,
                                  extra={"d_seg": new_d_seg})
        return new_state, metrics

    return step


# ---------------------------------------------------------------------------
# AdaptEvery
# ---------------------------------------------------------------------------
def make_adaptevery_step(cfg, model, d_main, d_aux, d_ent, d_point, txs) -> Callable:
    """model: ResNetUNetPoint returning (SegOutput, pred_vert).

    Loss weights come from cfg.adv (reference defaults: w_seg_aux 0.1,
    wp 1.0, w_dis 1e-3, w_dis_aux 2e-4, w_d_ent 1e-3, w_d_point 1e-3 —
    Trainer_AdaptSeg.py:26-30, Trainer_AdaptEvery.py:29-31)."""
    w_seg_aux, wp = cfg.adv.w_seg_aux, cfg.adv.wp
    w_dis, w_dis_aux = cfg.adv.w_dis, cfg.adv.w_dis_aux
    w_d_ent, w_d_point = cfg.adv.w_d_ent, cfg.adv.w_d_point

    @jax.jit
    def step(state: TrainState, batch: Dict[str, Array], sched: Dict[str, Array]):
        rng, rng_do = jax.random.split(state.rng)
        img_s, labels_s = batch["img_s"], batch["lab_s"]
        vert_s, img_t = batch["vert_s"], batch["img_t"]
        d_ent_net = state.extra["d_ent"]
        d_point_net = state.extra["d_point"]

        def fwd(params, bs, x):
            variables = {"params": params}
            if bs:
                variables["batch_stats"] = bs
            (out, vert), upd = model.apply(variables, x, True,
                                           rngs={"dropout": rng_do},
                                           mutable=["batch_stats"])
            return out, vert, upd["batch_stats"]

        def gen_loss(params):
            out_s, vert_pred_s, bs1 = fwd(params, state.seg.batch_stats, img_s)
            out_t, vert_pred_t, bs2 = fwd(params, bs1, img_t)
            loss_seg = L.loss_calc(out_s.pred, labels_s, jaccard=True)
            loss_seg_aux = L.loss_calc(out_s.aux, labels_s, jaccard=True)
            loss_point = L.chamfer_loss(vert_pred_s, vert_s)

            probs_t = jax.nn.softmax(out_t.pred.astype(jnp.float32), -1)
            probs_t_aux = jax.nn.softmax(out_t.aux.astype(jnp.float32), -1)
            ent_t = -probs_t * jnp.log(probs_t + 1e-10)
            adv = L.bce_with_logits(
                d_main.apply({"params": state.d_main.params}, probs_t), 1.0)
            adv_aux = L.bce_with_logits(
                d_aux.apply({"params": state.d_aux.params}, probs_t_aux), 1.0)
            adv_ent = L.bce_with_logits(
                d_ent.apply({"params": d_ent_net.params}, ent_t), 1.0)
            dp_vars = {"params": d_point_net.params}
            if d_point_net.batch_stats:
                dp_vars["batch_stats"] = d_point_net.batch_stats
            (d_pt, _, _), _ = d_point.apply(dp_vars, vert_pred_t, True,
                                            rngs={"dropout": rng_do},
                                            mutable=["batch_stats"])
            adv_point = L.bce_with_logits(d_pt, 1.0)

            total = (loss_seg + w_seg_aux * loss_seg_aux + wp * loss_point
                     + w_dis * adv + w_dis_aux * adv_aux + w_d_ent * adv_ent
                     + w_d_point * adv_point)
            metrics = {"seg_s": loss_seg, "seg_s_aux": loss_seg_aux,
                       "loss_point": loss_point, "loss_adv": adv,
                       "loss_adv_aux": adv_aux, "loss_adv_ent": adv_ent,
                       "loss_adv_point": adv_point}
            outs = dict(pred_s=out_s.pred, pred_s_aux=out_s.aux,
                        pred_t=out_t.pred, pred_t_aux=out_t.aux,
                        vert_s=vert_pred_s, vert_t=vert_pred_t,
                        ent_t=ent_t, bs=bs2)
            return total, (metrics, outs)

        grads, (metrics, outs) = jax.grad(gen_loss, has_aux=True)(state.seg.params)
        seg = _adam_update(txs["seg"],
                           state.seg.replace(batch_stats=outs["bs"]),
                           grads, sched["lr"])

        sg = jax.lax.stop_gradient
        probs = {k: jax.nn.softmax(sg(outs[k]).astype(jnp.float32), -1)
                 for k in ("pred_s", "pred_s_aux", "pred_t", "pred_t_aux")}
        ent_s = -probs["pred_s"] * jnp.log(probs["pred_s"] + 1e-10)
        ent_t = sg(outs["ent_t"])

        def dl(apply_fn, p, a, b):
            return (0.5 * L.bce_with_logits(apply_fn(p, a), 1.0)
                    + 0.5 * L.bce_with_logits(apply_fn(p, b), 0.0))

        f_main = lambda p, x: d_main.apply({"params": p}, x)
        f_aux = lambda p, x: d_aux.apply({"params": p}, x)
        f_ent = lambda p, x: d_ent.apply({"params": p}, x)
        def f_pt(p, x):
            dv = {"params": p}
            if d_point_net.batch_stats:
                dv["batch_stats"] = d_point_net.batch_stats
            (o, _, _), _ = d_point.apply(dv, x, True, rngs={"dropout": rng_do},
                                         mutable=["batch_stats"])
            return o
        g1 = jax.grad(lambda p: dl(f_main, p, probs["pred_s"], probs["pred_t"]))(
            state.d_main.params)
        g2 = jax.grad(lambda p: dl(f_aux, p, probs["pred_s_aux"],
                                   probs["pred_t_aux"]))(state.d_aux.params)
        g3 = jax.grad(lambda p: dl(f_ent, p, ent_s, ent_t))(d_ent_net.params)
        g4 = jax.grad(lambda p: dl(f_pt, p, sg(outs["vert_s"]),
                                   sg(outs["vert_t"])))(d_point_net.params)
        new_d_main = _adam_update(txs["d_main"], state.d_main, g1, sched["lr_dis"])
        new_d_aux = _adam_update(txs["d_aux"], state.d_aux, g2, sched["lr_dis"])
        new_d_ent = _adam_update(txs["d_ent"], d_ent_net, g3, sched["lr_dis"])
        new_d_point = _adam_update(txs["d_point"], d_point_net, g4, sched["lr_dis"])

        new_state = state.replace(
            step=state.step + 1, rng=rng, seg=seg, d_main=new_d_main,
            d_aux=new_d_aux,
            extra={"d_ent": new_d_ent, "d_point": new_d_point})
        return new_state, metrics

    return step


# ---------------------------------------------------------------------------
# BCL
# ---------------------------------------------------------------------------
def make_bcl_step(cfg, model, txs) -> Callable:
    """BCL self-training step (reference Trainer_BCL.py:222-275 with the
    documented intent — the snapshot's `init_test_dataset` import and
    Cityscapes shapes are vestigial). ``batch['plabel_t']`` carries the
    round's pseudo-labels with 255 = ignore.

    Loss composition per the reference: ``(ce_s + lambt*ce_t) +
    lamb*(ent_s + lambt*ent_t) + metric`` with lambt=0.3, lamb=0.4
    defaults (Trainer_BCL.py:46-47, :238-259)."""
    num_classes = cfg.model.num_classes
    lambt = cfg.run.bcl_lambt
    lamb = cfg.run.bcl_lamb

    @jax.jit
    def step(state: TrainState, batch: Dict[str, Array], sched: Dict[str, Array]):
        img_s, labels_s = batch["img_s"], batch["lab_s"]
        img_t, plabel_t = batch["img_t"], batch["plabel_t"]

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.seg.batch_stats:
                variables["batch_stats"] = state.seg.batch_stats
                mutable = ["batch_stats"]
            (pred_s, feat_s), upd = model.apply(variables, img_s, True, True,
                                                mutable=mutable)
            (pred_t, feat_t), upd = model.apply(
                {**variables, "batch_stats": upd.get("batch_stats", {})}
                if mutable else variables, img_t, True, False, mutable=mutable)
            ce_s = L.cross_entropy_loss(pred_s, labels_s)
            ce_t = L.cross_entropy_ignore(pred_t, plabel_t, 255)
            ent = (jnp.mean(L.bcl_entropy_loss(pred_s))
                   + lambt * jnp.mean(L.bcl_entropy_loss(pred_t)))

            # bidirectional prototype metric loss (loss.py:168-219): source
            # prototypes vs target features and vice versa, CE on overlap
            # classes; simplified to the first sample per domain like the
            # reference (batch size 1 semantics)
            fh, fw = feat_s.shape[1:3]
            lab_s_small = jax.image.resize(labels_s, (labels_s.shape[0], fh, fw),
                                           "nearest")[0]
            plab_small = jax.image.resize(plabel_t, (plabel_t.shape[0], fh, fw),
                                          "nearest")[0]
            cs_map1 = L.bcl_prototype_similarity(feat_s[0], lab_s_small,
                                                 feat_t[0], num_classes)
            cs_map2 = L.bcl_prototype_similarity(feat_t[0], plab_small,
                                                 feat_s[0], num_classes)
            m1 = L.cross_entropy_ignore(
                jnp.transpose(cs_map1, (1, 2, 0))[None], plab_small[None], 255)
            m2 = L.cross_entropy_ignore(
                jnp.transpose(cs_map2, (1, 2, 0))[None], lab_s_small[None], 255)
            metric = m1 + m2

            total = ce_s + lambt * ce_t + lamb * ent + metric
            metrics = {"seg_s": ce_s, "seg_t_pseudo": ce_t, "loss_ent": ent,
                       "metric_loss": metric}
            new_bs = upd.get("batch_stats", state.seg.batch_stats) if mutable \
                else state.seg.batch_stats
            return total, (new_bs, metrics)

        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(state.seg.params)
        seg = _adam_update(txs["seg"], state.seg.replace(batch_stats=new_bs),
                           grads, sched["lr"])
        return state.replace(step=state.step + 1, seg=seg), metrics

    return step
