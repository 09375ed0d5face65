"""Per-method jitted train steps — the functional core.

Each UDA method from the reference trainer tower becomes a builder returning
a jitted ``step(state, batch, sched) -> (state, metrics)``:

  baseline   Trainer_baseline.train_epoch   (Trainer_baseline.py:212-253)
  adaptseg   Trainer_AdapSeg.train_epoch    (Trainer_AdaptSeg.py:128-235)
  advent     Trainer_Advent.train_epoch     (Trainer_Advent.py:55-180)
  mpscl      Trainer_MPSCL.train_epoch      (Trainer_MPSCL.py:82-295) — SLCL
  mccl       Trainer_MCCL.train_epoch       (Trainer_MCCL.py:166-381) — SLCL

GAN alternation runs inside one jitted step: generator gradients are taken
w.r.t. segmentor params only (discriminator params are simply not
differentiated — the functional equivalent of the reference's
``requires_grad`` flipping), and discriminator gradients use
``stop_gradient`` on the predictions. All per-batch scalars stay on device;
the trainer reduces them once per epoch (eliminating the reference's
per-batch ``.item()``/``.cpu()`` syncs, SURVEY §3.1).

``sched`` is a small dict of traced scalars (lr, lr_dis, warm gate) so LR
decay and warmup do not retrigger compilation.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..ops import centroids as cen
from ..ops import losses as L
from .state import NetState, TrainState

Array = jax.Array


def clip_step_norm(step_vec, clip):
    """Cap ``step_vec`` to L2 norm ``clip``, robust to non-finite input:
    if the unbounded RAIN ascent step overflowed (1/seg_loss -> inf), the
    naive ``v * min(1, clip/||v||)`` is ``inf * 0 = NaN`` — failing exactly
    in the blow-up regime the clamp guards. Non-finite components are
    zeroed before the norm."""
    step_vec = jnp.where(jnp.isfinite(step_vec), step_vec, 0.0)
    sn = jnp.linalg.norm(step_vec)
    return step_vec * jnp.minimum(1.0, clip / (sn + 1e-12))


def _remat_wrap(fwd, remat):
    """Optional rematerialization of a forward fn (cfg.model.remat).

    ``remat`` accepts False/""/off (no remat), True/"full" (plain
    jax.checkpoint: recompute everything in the backward — trades HBM
    residency for FLOPs), or "dots" (checkpoint_dots policy: keep matmul/
    dot results resident, recompute the elementwise chains between them —
    the traffic-cutting middle ground for bandwidth-bound convnets)."""
    mode = remat if isinstance(remat, str) else ("full" if remat else "")
    if mode in ("", "0", "false", "off"):
        return fwd
    if mode == "dots":
        return jax.checkpoint(
            fwd, policy=jax.checkpoint_policies.checkpoint_dots)
    return jax.checkpoint(fwd)


def _apply_seg(model, net: NetState, x, train=True, remat=False):
    """Run the segmentor, returning (SegOutput, new_batch_stats).

    ``remat`` wraps the forward in jax.checkpoint so the backward pass
    recomputes activations instead of holding them in HBM (see _remat_wrap;
    set via cfg.model.remat)."""
    variables = {"params": net.params}
    if net.batch_stats:
        variables["batch_stats"] = net.batch_stats
        if train:
            def fwd(variables, x):
                return model.apply(variables, x, True, mutable=["batch_stats"])
            fwd = _remat_wrap(fwd, remat)
            out, upd = fwd(variables, x)
            return out, upd["batch_stats"]
        return model.apply(variables, x, False), net.batch_stats
    return model.apply(variables, x, train), net.batch_stats


def _d_apply(disc, params, x):
    return disc.apply({"params": params}, x)


def _d_acc(logits, is_source: bool):
    """Discriminator accuracy bookkeeping (Trainer_AdaptSeg.py:196-228)."""
    p = (jax.nn.sigmoid(logits.astype(jnp.float32)) >= 0.5).astype(jnp.float32)
    m = jnp.mean(p)
    return m if is_source else 1.0 - m


def _entropy_map(logits, kind: str):
    """Discriminator input map. 'advent' = raw -p*log(p+eps)
    (Trainer_Advent.py:86-88); 'weighted' = prob_2_entropy with log2/log2C
    (Trainer_MPSCL.py:171-173)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if kind == "advent":
        return -probs * jnp.log(probs + 1e-7)
    return L.prob_2_entropy(probs)


# ---------------------------------------------------------------------------
# baseline
# ---------------------------------------------------------------------------
def make_baseline_step(cfg, model, txs) -> Callable:
    aux_w = cfg.adv.w_seg_aux
    # Domain selection (Trainer_baseline.py:221-227): train_with_s wins;
    # train_with_t alone = supervised-target oracle.
    on_target = cfg.data.train_with_t and not cfg.data.train_with_s
    img_key, lab_key = ("img_t", "lab_t") if on_target else ("img_s", "lab_s")
    loss_key = "seg_t" if on_target else "seg_s"

    @jax.jit
    def step(state: TrainState, batch: Dict[str, Array], sched: Dict[str, Array]):
        def loss_fn(params):
            out, new_bs = _apply_seg(model, state.seg.replace(params=params),
                                     batch[img_key], remat=cfg.model.remat)
            loss = L.loss_calc(out.pred, batch[lab_key], jaccard=True)
            metrics = {loss_key: loss}
            if out.aux is not None:
                laux = L.loss_calc(out.aux, batch[lab_key], jaccard=True)
                loss = loss + aux_w * laux
                metrics[loss_key + "_aux"] = laux
            return loss, (new_bs, metrics)

        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(state.seg.params)
        opt_state = state.seg.opt_state
        opt_state.hyperparams["learning_rate"] = sched["lr"]
        updates, new_opt = txs["seg"].update(grads, opt_state, state.seg.params)
        params = optax.apply_updates(state.seg.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            seg=NetState(params=params, batch_stats=new_bs, opt_state=new_opt))
        return new_state, metrics

    return step


# ---------------------------------------------------------------------------
# shared generator/discriminator machinery for adversarial methods
# ---------------------------------------------------------------------------
def _gan_step(cfg, model, disc, disc_aux, txs, gen_loss_fn):
    """Build a jitted adversarial step from a method-specific generator loss.

    ``gen_loss_fn(params, state, batch, sched)`` must return
    ``(loss, (new_bs, aux_outs, metrics))`` where ``aux_outs`` carries the
    (pre-detach) logits needed by the discriminator phase:
    {'pred_s', 'pred_t', 'pred_s_aux', 'pred_t_aux', 'centroids'?}.
    """
    multilvl = cfg.model.multilvl
    d_input_kind = "advent" if cfg.method in ("advent", "mpscl", "slcl") else "softmax"
    if cfg.method in ("mpscl", "slcl"):
        d_input_kind = "weighted"

    def d_in(logits):
        if d_input_kind == "softmax":
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return _entropy_map(logits, d_input_kind)

    @jax.jit
    def step(state: TrainState, batch: Dict[str, Array], sched: Dict[str, Array]):
        # ---- generator phase ----
        grads, (new_bs, outs, metrics) = jax.grad(
            gen_loss_fn, has_aux=True)(state.seg.params, state, batch, sched)
        seg_opt = state.seg.opt_state
        seg_opt.hyperparams["learning_rate"] = sched["lr"]
        updates, new_seg_opt = txs["seg"].update(grads, seg_opt, state.seg.params)
        seg_params = optax.apply_updates(state.seg.params, updates)

        # ---- discriminator phase (detached preds, halved BCE) ----
        pred_s = jax.lax.stop_gradient(outs["pred_s"])
        pred_t = jax.lax.stop_gradient(outs["pred_t"])

        def d_loss_fn(d_params):
            o_s = _d_apply(disc, d_params, d_in(pred_s))
            o_t = _d_apply(disc, d_params, d_in(pred_t))
            loss = 0.5 * L.bce_with_logits(o_s, 1.0) + 0.5 * L.bce_with_logits(o_t, 0.0)
            return loss, (o_s, o_t)

        (d_loss, (o_s, o_t)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_main.params)
        d_opt = state.d_main.opt_state
        d_opt.hyperparams["learning_rate"] = sched["lr_dis"]
        d_updates, new_d_opt = txs["d_main"].update(d_grads, d_opt, state.d_main.params)
        d_params = optax.apply_updates(state.d_main.params, d_updates)
        metrics.update({
            "loss_dis": d_loss,
            "dis_acc_s": _d_acc(o_s, True),
            "dis_acc_t": _d_acc(o_t, False),
        })
        new_d_main = NetState(params=d_params, batch_stats=state.d_main.batch_stats,
                              opt_state=new_d_opt)

        new_d_aux = state.d_aux
        if multilvl and state.d_aux is not None:
            pred_s_aux = jax.lax.stop_gradient(outs["pred_s_aux"])
            pred_t_aux = jax.lax.stop_gradient(outs["pred_t_aux"])

            def d_aux_loss_fn(d_params):
                o_s = _d_apply(disc_aux, d_params, d_in(pred_s_aux))
                o_t = _d_apply(disc_aux, d_params, d_in(pred_t_aux))
                loss = 0.5 * L.bce_with_logits(o_s, 1.0) + 0.5 * L.bce_with_logits(o_t, 0.0)
                return loss, (o_s, o_t)

            (da_loss, (oa_s, oa_t)), da_grads = jax.value_and_grad(
                d_aux_loss_fn, has_aux=True)(state.d_aux.params)
            da_opt = state.d_aux.opt_state
            da_opt.hyperparams["learning_rate"] = sched["lr_dis"]
            da_updates, new_da_opt = txs["d_aux"].update(
                da_grads, da_opt, state.d_aux.params)
            da_params = optax.apply_updates(state.d_aux.params, da_updates)
            metrics.update({
                "loss_dis_aux": da_loss,
                "dis_aux_acc_s": _d_acc(oa_s, True),
                "dis_aux_acc_t": _d_acc(oa_t, False),
            })
            new_d_aux = NetState(params=da_params,
                                 batch_stats=state.d_aux.batch_stats,
                                 opt_state=new_da_opt)

        new_state = state.replace(
            step=state.step + 1,
            rng=jax.random.fold_in(state.rng, 1),
            seg=NetState(params=seg_params, batch_stats=new_bs,
                         opt_state=new_seg_opt),
            d_main=new_d_main, d_aux=new_d_aux,
            centroids=outs.get("centroids", state.centroids))
        return new_state, metrics

    return step


# ---------------------------------------------------------------------------
# AdaptSeg (output-space adversarial)
# ---------------------------------------------------------------------------
def make_adaptseg_step(cfg, model, disc, disc_aux, txs) -> Callable:
    aux_w = cfg.adv.w_seg_aux

    def gen_loss(params, state, batch, sched):
        net = state.seg.replace(params=params)
        out_s, bs1 = _apply_seg(model, net, batch["img_s"],
                                remat=cfg.model.remat)
        out_t, bs2 = _apply_seg(model, net.replace(batch_stats=bs1),
                                batch["img_t"], remat=cfg.model.remat)
        loss_seg = L.loss_calc(out_s.pred, batch["lab_s"], jaccard=True)
        metrics = {"seg_s": loss_seg}
        if cfg.model.multilvl and out_s.aux is not None:
            laux = L.loss_calc(out_s.aux, batch["lab_s"], jaccard=True)
            metrics["seg_s_aux"] = laux
            loss_seg = loss_seg + aux_w * laux

        d_out = _d_apply(disc, state.d_main.params,
                         jax.nn.softmax(out_t.pred.astype(jnp.float32), -1))
        loss_adv = L.bce_with_logits(d_out, 1.0)
        metrics["loss_adv"] = loss_adv
        total = loss_seg + cfg.adv.w_dis * loss_adv
        if cfg.model.multilvl and out_t.aux is not None:
            d_out_aux = _d_apply(disc_aux, state.d_aux.params,
                                 jax.nn.softmax(out_t.aux.astype(jnp.float32), -1))
            loss_adv_aux = L.bce_with_logits(d_out_aux, 1.0)
            metrics["loss_adv_aux"] = loss_adv_aux
            total = total + cfg.adv.w_dis_aux * loss_adv_aux
        outs = {"pred_s": out_s.pred, "pred_t": out_t.pred,
                "pred_s_aux": out_s.aux, "pred_t_aux": out_t.aux}
        return total, (bs2, outs, metrics)

    return _gan_step(cfg, model, disc, disc_aux, txs, gen_loss)


# ---------------------------------------------------------------------------
# AdvEnt (entropy-map adversarial + optional ent-min / class prior)
# ---------------------------------------------------------------------------
def make_advent_step(cfg, model, disc, disc_aux, txs) -> Callable:
    aux_w = cfg.adv.w_seg_aux
    prior = jnp.asarray(cfg.adv.class_prior, jnp.float32)

    def gen_loss(params, state, batch, sched):
        net = state.seg.replace(params=params)
        out_s, bs1 = _apply_seg(model, net, batch["img_s"],
                                remat=cfg.model.remat)
        out_t, bs2 = _apply_seg(model, net.replace(batch_stats=bs1),
                                batch["img_t"], remat=cfg.model.remat)
        loss_seg = L.loss_calc(out_s.pred, batch["lab_s"], jaccard=True)
        metrics = {"seg_s": loss_seg}
        if cfg.model.multilvl and out_s.aux is not None:
            laux = L.loss_calc(out_s.aux, batch["lab_s"], jaccard=True)
            metrics["seg_s_aux"] = laux
            loss_seg = loss_seg + aux_w * laux

        probs_t = jax.nn.softmax(out_t.pred.astype(jnp.float32), -1)
        ent_t = -probs_t * jnp.log(probs_t + 1e-7)
        loss_adv = L.bce_with_logits(_d_apply(disc, state.d_main.params, ent_t), 1.0)
        metrics["loss_adv"] = loss_adv
        total = loss_seg + cfg.adv.w_dis * loss_adv
        if cfg.model.multilvl and out_t.aux is not None:
            probs_ta = jax.nn.softmax(out_t.aux.astype(jnp.float32), -1)
            ent_ta = -probs_ta * jnp.log(probs_ta + 1e-7)
            loss_adv_aux = L.bce_with_logits(
                _d_apply(disc_aux, state.d_aux.params, ent_ta), 1.0)
            metrics["loss_adv_aux"] = loss_adv_aux
            total = total + cfg.adv.w_dis_aux * loss_adv_aux
        if cfg.adv.w_ent:
            # intent: entropy of the *main* target prediction
            # (Trainer_Advent.py:107-111 reuses a clobbered variable when
            # multilvl — repaired to main softmax)
            loss_ent = L.loss_entropy(probs_t, 1e-7)
            metrics["loss_ent"] = loss_ent
            total = total + cfg.adv.w_ent * loss_ent
        if cfg.adv.w_prior:
            loss_prior = L.loss_class_prior(probs_t, prior, cfg.adv.prior_slack)
            metrics["loss_prior"] = loss_prior
            total = total + loss_prior
        outs = {"pred_s": out_s.pred, "pred_t": out_t.pred,
                "pred_s_aux": out_s.aux, "pred_t_aux": out_t.aux}
        return total, (bs2, outs, metrics)

    return _gan_step(cfg, model, disc, disc_aux, txs, gen_loss)


# ---------------------------------------------------------------------------
# MPSCL — the SLCL paper method on the margin-preserving path (train_SLCL.py)
# ---------------------------------------------------------------------------
def make_mpscl_step(cfg, model, disc, disc_aux, txs,
                    centroids_loaded: bool = False) -> Callable:
    c = cfg.contrastive

    def gen_loss(params, state, batch, sched):
        net = state.seg.replace(params=params)
        out_s, bs1 = _apply_seg(model, net, batch["img_s"],
                                remat=cfg.model.remat)
        out_t, bs2 = _apply_seg(model, net.replace(batch_stats=bs1),
                                batch["img_t"], remat=cfg.model.remat)
        labels_s = batch["lab_s"]

        # seg loss: CE + dice (Trainer_MPSCL.py:125; aux loss disabled :128-130)
        loss_seg = (L.loss_calc(out_s.pred, labels_s, jaccard=False)
                    + L.dice_loss(out_s.pred, labels_s))
        metrics = {"seg_s": loss_seg}

        # EMA class centers from detached source features (:133-134);
        # zero-init fallback centers adopt the first batch means outright
        new_centroids = cen.update_class_center_iter(
            out_s.dcdr_ft, labels_s, state.centroids,
            momentum=c.class_center_m, num_classes=cfg.model.num_classes,
            bootstrap=None if centroids_loaded else (state.step == 0))
        # cosine pseudo-labels + confidence mask (:135)
        plab_t, pmask_t = cen.generate_pseudo_label(
            out_t.dcdr_ft, new_centroids, pixel_sel_th=c.pixel_sel_th)

        centers = jax.lax.stop_gradient(new_centroids)
        mpcl_src = L.mpcl_loss_calc(
            out_s.dcdr_ft, labels_s, centers,
            temperature=c.src_temp, base_temperature=c.src_base_temp,
            margin=c.src_margin, easy_margin=c.easy_margin)
        mpcl_trg = L.mpcl_loss_calc(
            out_t.dcdr_ft, plab_t, centers,
            temperature=c.trg_temp, base_temperature=c.trg_base_temp,
            margin=c.trg_margin, pixel_sel_loc=pmask_t, resize_labels=False,
            easy_margin=c.easy_margin)
        metrics["loss_mpscl_tr"] = mpcl_src
        metrics["loss_mpscl_tg"] = mpcl_trg

        # CNR: match target centroid norms to source (intended semantics; the
        # reference's MPSCL CNR block is a broken placeholder —
        # Trainer_MPSCL.py:150-166 calls cal_centroid with a nonexistent
        # signature — so we use the MCCL formula, Trainer_MCCL.py:303-315)
        loss_cnr = jnp.zeros((), jnp.float32)
        if c.CNR and c.CNR_w > 0:
            probs_t = jax.nn.softmax(out_t.pred.astype(jnp.float32), -1)
            res = cen.target_soft_centroids(
                out_t.dcdr_ft, probs_t, partition=1,
                threshold=c.thd, weighted_ave=c.wtd_ave,
                num_classes=cfg.model.num_classes)
            loss_cnr = L.cnr_loss(centers, res.centroids[0])
        metrics["loss_cnr"] = loss_cnr

        # adversarial branch on weighted self-information maps (:170-191)
        ent_t = L.prob_2_entropy(jax.nn.softmax(out_t.pred.astype(jnp.float32), -1))
        loss_adv = L.bce_with_logits(_d_apply(disc, state.d_main.params, ent_t), 1.0)
        metrics["loss_adv"] = loss_adv
        # contrastive terms gated by the warmup scalar, same mechanism as
        # MCCL's clda gate (Trainer_MCCL.py:340-347). The reference MPSCL has
        # no warmup because its executed protocol always starts from a
        # pretrained segmentor + matching center file (Trainer_MPSCL.py:
        # 306-331); warm==1.0 from epoch 0 when contrastive.warmup_epochs=0
        # (the default) reproduces that.
        warm = sched["warm"]
        total = (loss_seg + cfg.adv.w_dis * loss_adv
                 + warm * (c.w_mpcl_s * mpcl_src + c.w_mpcl_t * mpcl_trg
                           + c.CNR_w * loss_cnr))
        if cfg.model.multilvl and out_t.aux is not None:
            ent_ta = L.prob_2_entropy(jax.nn.softmax(out_t.aux.astype(jnp.float32), -1))
            loss_adv_aux = L.bce_with_logits(
                _d_apply(disc_aux, state.d_aux.params, ent_ta), 1.0)
            metrics["loss_adv_aux"] = loss_adv_aux
            total = total + cfg.adv.w_dis_aux * loss_adv_aux

        outs = {"pred_s": out_s.pred, "pred_t": out_t.pred,
                "pred_s_aux": out_s.aux, "pred_t_aux": out_t.aux,
                "centroids": new_centroids}
        return total, (bs2, outs, metrics)

    return _gan_step(cfg, model, disc, disc_aux, txs, gen_loss)


# ---------------------------------------------------------------------------
# MCCL — SLCL proper: soft labels + reversed Monte Carlo + CNR
# ---------------------------------------------------------------------------
def make_mccl_step(cfg, model, txs, rain_model=None,
                   centroids_loaded: bool = False) -> Callable:
    c = cfg.contrastive
    P = max(int(c.part), 1)
    n_class = cfg.model.num_classes
    use_rain = cfg.rain.enabled and rain_model is not None

    @jax.jit
    def step(state: TrainState, batch: Dict[str, Array], sched: Dict[str, Array]):
        rng, rng_part, rng_noise = jax.random.split(state.rng, 3)

        def rain_pair(img_s, img_t):
            # stylization operands (Trainer_MCCL.py:196-202): default one
            # content/style image; mulstyle = whole batch of both; mulstyle2
            # = whole content batch, one style image (mulstyle2 wins when
            # both set, matching the reference's if/elif order)
            if cfg.rain.mulstyle2:
                return img_s, img_t[0:1]
            if cfg.rain.mulstyle:
                return img_s, img_t
            return img_s[0:1], img_t[0:1]

        if use_rain:
            # RAIN stylization (Trainer_MCCL.py:196-216); sampling carried
            # for the epsilon ascent
            rain_params = state.extra["rain"]
            rc0, rs0 = rain_pair(batch["img_s"], batch["img_t"])
            _, fresh = rain_model.apply(
                {"params": rain_params}, rc0, rs0, None,
                method="style_transfer", rngs={"noise": rng_noise})
            sampling0 = jnp.where(sched["fresh"] > 0, fresh, state.sampling)
        else:
            sampling0 = state.sampling

        def loss_fn(params, sampling):
            net = state.seg.replace(params=params)
            img_s, labels_s = batch["img_s"], batch["lab_s"]
            img_t, img_t_aug = batch["img_t"], batch["img_t_aug"]
            s_size, t_size = img_s.shape[0], img_t.shape[0]

            style_size = 0
            img_style = None
            if use_rain:
                from .steps_rain import stylized_to_gray3
                rc, rs = rain_pair(img_s, img_t)
                img_style, _ = rain_model.apply(
                    {"params": state.extra["rain"]}, rc, rs,
                    sampling, method="style_transfer",
                    rngs={"noise": rng_noise})
                img_style = stylized_to_gray3(img_style)
                style_size = img_style.shape[0]
                if cfg.rain.style_alpha < 1.0:
                    # soften the style shift (see RAINConfig.style_alpha)
                    a = cfg.rain.style_alpha
                    img_style = (a * img_style
                                 + (1.0 - a) * img_s[:style_size])
            seg_sz = style_size + s_size
            if c.concat_forward:
                # reference-exact: ONE forward over the full concat
                # (Trainer_MCCL.py:217/:246) — couples BN stats across domains
                parts = ([img_style, img_s] if use_rain else [img_s])
                x = jnp.concatenate(parts + [img_t, img_t_aug], axis=0)
                out, new_bs = _apply_seg(model, net, x, remat=cfg.model.remat)
                pred_src_all = out.pred[:seg_sz]
                pred_t_all = out.pred[seg_sz:]
                dcdr_s = out.dcdr_ft[style_size:seg_sz]
                dcdr_t = out.dcdr_ft[seg_sz:seg_sz + t_size]
                dcdr_t_aug = out.dcdr_ft[seg_sz + t_size:]
                btl_src = out.bottleneck[:seg_sz] if use_rain else None
            else:
                # default repair: two domain-pure forwards so BatchNorm
                # statistics never mix domains (see ContrastiveConfig.
                # concat_forward; measured -2.3x target dice otherwise)
                x_src = (jnp.concatenate([img_style, img_s], axis=0)
                         if use_rain else img_s)
                out_src, bs1 = _apply_seg(model, net, x_src,
                                          remat=cfg.model.remat)
                out_trg, new_bs = _apply_seg(
                    model, net.replace(batch_stats=bs1),
                    jnp.concatenate([img_t, img_t_aug], axis=0),
                    remat=cfg.model.remat)
                pred_src_all = out_src.pred
                pred_t_all = out_trg.pred
                dcdr_s = out_src.dcdr_ft[style_size:]
                dcdr_t = out_trg.dcdr_ft[:t_size]
                dcdr_t_aug = out_trg.dcdr_ft[t_size:]
                btl_src = out_src.bottleneck if use_rain else None
            pred_s = pred_src_all[style_size:seg_sz]

            loss_seg = L.loss_calc(pred_s, labels_s, jaccard=True)
            metrics = {"seg_s": loss_seg}
            total = loss_seg
            seg_only = loss_seg
            if use_rain:
                # style seg loss + bottleneck consistency (:221-244)
                loss_style = L.loss_calc(pred_src_all[:style_size],
                                         labels_s[:style_size], jaccard=True)
                b_style = btl_src[:style_size]
                b_s = btl_src[style_size:2 * style_size]
                loss_consist = jnp.mean((b_s.astype(jnp.float32)
                                         - b_style.astype(jnp.float32)) ** 2)
                metrics["seg_style"] = loss_style
                metrics["loss_consist"] = loss_consist
                total = total + loss_style + cfg.rain.consist_w * loss_consist
                # epsilon ascent differentiates ONLY the stylized seg loss —
                # the reference's samp_loss is captured before loss_seg_s is
                # added (Trainer_MCCL.py:229-241)
                seg_only = loss_style

                # --- stylized-branch diagnostics (r4: per-seed RAIN
                # regression root-causing). All stop_gradient'd scalars:
                # style_hist_d  — total-variation distance between 32-bin
                #                 intensity histograms of the stylized batch
                #                 and its source content (style drift);
                # style_mean/std, src_mean — raw intensity stats;
                # dice_style_c{k} / dice_src_c{k} — hard per-class train-res
                #                 dice of each branch vs the source labels
                #                 (does the net still FIT the stylized view?)
                def _hist32(x):
                    idx = jnp.clip((x.astype(jnp.float32) * 32.0)
                                   .astype(jnp.int32), 0, 31)
                    h = jnp.zeros((32,), jnp.float32).at[idx.reshape(-1)].add(1.0)
                    return h / jnp.maximum(jnp.sum(h), 1.0)

                sty = jax.lax.stop_gradient(img_style)
                src_ref = img_s[:style_size]
                metrics["style_hist_d"] = 0.5 * jnp.sum(
                    jnp.abs(_hist32(sty) - _hist32(src_ref)))
                metrics["style_mean"] = jnp.mean(sty.astype(jnp.float32))
                metrics["style_std"] = jnp.std(sty.astype(jnp.float32))
                metrics["src_mean"] = jnp.mean(src_ref.astype(jnp.float32))
                lab_sty = labels_s[:style_size]
                cls_sty = jnp.argmax(jax.lax.stop_gradient(
                    pred_src_all[:style_size]), -1)
                cls_src = jnp.argmax(jax.lax.stop_gradient(pred_s), -1)
                for k in range(1, n_class):
                    for tag, cls_map, lab_map in (
                            ("style", cls_sty, lab_sty),
                            ("src", cls_src, labels_s)):
                        pk = (cls_map == k).astype(jnp.float32)
                        lk = (lab_map == k).astype(jnp.float32)
                        num = 2.0 * jnp.sum(pk * lk)
                        den = jnp.maximum(jnp.sum(pk) + jnp.sum(lk), 1.0)
                        metrics[f"dice_{tag}_c{k}"] = num / den

            probs_t_all = jax.nn.softmax(pred_t_all.astype(jnp.float32), -1)
            probs_t, probs_t_aug = probs_t_all[:t_size], probs_t_all[t_size:]
            if c.seg_pseudo:
                lp = L.seg_pseudo_loss(probs_t, c.thd, n_class)
                metrics["loss_pseudo"] = lp
                total = total + 0.5 * lp

            # source centroids, EMA across steps (Trainer_MCCL.py:275-277);
            # zero-init centers adopt the first batch means outright
            centroid_s = cen.source_centroids(
                dcdr_s, labels_s, num_classes=n_class,
                previous=state.centroids, momentum=c.ctd_mmt,
                bootstrap=None if centroids_loaded else (state.step == 0))
            centroid_s = jax.lax.stop_gradient(centroid_s)

            # rMC soft target centroids (:281-295, repaired partitioning)
            res_t = cen.target_soft_centroids(
                dcdr_t, probs_t, partition=P, rng=rng_part,
                threshold=c.thd, weighted_ave=c.wtd_ave, num_classes=n_class)
            res_ta = cen.target_soft_centroids(
                dcdr_t_aug, probs_t_aug, partition=1,
                threshold=c.thd, weighted_ave=c.wtd_ave, num_classes=n_class)
            centroid_t_aug = res_ta.centroids[0]
            metrics["ratio_t"] = res_t.ratio
            metrics["ratio_t_aug"] = res_ta.ratio

            # --- on-device diagnostics (cheap (C,F)-level reductions) ---
            # conf_t: mean target confidence = pseudo-label maturity;
            # align_st: mean fg cosine(t_i, s_i) (adaptation progress);
            # spread_tt: mean off-diag fg cosine(t_i, t_j) (collapse indicator)
            metrics["conf_t"] = jnp.mean(jnp.max(probs_t, axis=-1))
            nrm = lambda z: z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
            t0 = jax.lax.stop_gradient(nrm(res_t.centroids[0]))
            s0 = nrm(centroid_s)
            cos_st = t0 @ s0.T
            cos_tt = t0 @ t0.T
            fg = jnp.arange(n_class) >= 1
            metrics["align_st"] = jnp.sum(jnp.diag(cos_st) * fg) / jnp.sum(fg)
            off = (1.0 - jnp.eye(n_class)) * jnp.outer(fg, fg)
            metrics["spread_tt"] = jnp.sum(cos_tt * off) / jnp.sum(off)

            # CNR (:303-315) + inter/intra contrastive (:317-332), averaged
            # over the P partitions
            cnr = jnp.zeros((), jnp.float32)
            inter = jnp.zeros((), jnp.float32)
            intra = jnp.zeros((), jnp.float32)
            for p in range(P):
                cent_p = res_t.centroids[p]
                cnr = cnr + L.cnr_loss(centroid_s, cent_p) / P
                inter = inter + L.centroid_contrastive_loss(
                    centroid_s, cent_p, bg=c.bg, split=c.contrast_split) / P
                intra = intra + L.centroid_contrastive_loss(
                    cent_p, centroid_t_aug, bg=c.bg, split=c.contrast_split) / P
            metrics["CNR"] = cnr
            metrics["inter_c_loss"] = inter
            metrics["intra_c_loss"] = intra

            contrast = c.inter_w * inter + (c.intra_w * intra if c.intra else 0.0)
            warm = sched["warm"]  # 1.0 after warmup_epochs (:340-347)
            if c.clda:
                total = total + warm * contrast
            if c.CNR:
                total = total + warm * c.CNR_w * cnr
            if c.stdmin:
                total = total + warm * c.w_stdmin * jnp.sum(res_t.stddevs)
            return total, (new_bs, centroid_s, metrics, seg_only)

        if use_rain:
            # ONE forward, two backwards off the same linearization — the
            # functional equivalent of the reference's retain_graph reuse
            # (Trainer_MCCL.py:229-243): cotangent (1,0) gives the full
            # generator gradient, (0,1) gives d(stylized seg loss)/d(sampling)
            # for the epsilon ascent.
            def both(params, sampling):
                total, (new_bs, cent, metrics, seg_only) = loss_fn(params, sampling)
                return (total, seg_only), (new_bs, cent, metrics)

            (totals, vjp_fn, (new_bs, centroid_s, metrics)) = jax.vjp(
                both, state.seg.params, sampling0, has_aux=True)
            total_val, seg_val = totals
            one = jnp.ones_like(total_val)
            zero = jnp.zeros_like(seg_val)
            grads, _ = vjp_fn((one, zero))
            _, g_samp = vjp_fn((zero, jnp.ones_like(seg_val)))
            # ascent step (lr_eps / samp_loss) * grad (Trainer_RAIN.py:
            # 133-147). The 1/loss scale EXPLODES once the stylized seg loss
            # gets small (late epochs), throwing the sampling far outside the
            # VAE prior — the diagnosed cause of the per-seed RAIN+eps
            # regressions (examples/README.md). rain.eps_clip caps the step
            # L2 norm per iteration (0 = reference-exact unbounded).
            step_vec = (cfg.optim.lr_eps / seg_val) * g_samp
            if cfg.rain.eps_clip > 0:
                step_vec = clip_step_norm(step_vec, cfg.rain.eps_clip)
            new_sampling = jnp.where(sched["eps_on"] > 0,
                                     sampling0 + step_vec, sampling0)
            metrics["eps_step_norm"] = (sched["eps_on"]
                                        * jnp.linalg.norm(step_vec))
            metrics["sampling_norm"] = jnp.linalg.norm(new_sampling)
            metrics["seg_style_val"] = seg_val
        else:
            grads, (new_bs, centroid_s, metrics, _) = jax.grad(
                loss_fn, has_aux=True)(state.seg.params, sampling0)
            new_sampling = state.sampling
        opt_state = state.seg.opt_state
        opt_state.hyperparams["learning_rate"] = sched["lr"]
        updates, new_opt = txs["seg"].update(grads, opt_state, state.seg.params)
        params = optax.apply_updates(state.seg.params, updates)

        new_state = state.replace(
            step=state.step + 1, rng=rng,
            seg=NetState(params=params, batch_stats=new_bs, opt_state=new_opt),
            centroids=centroid_s, sampling=new_sampling)
        return new_state, metrics

    return step


# ---------------------------------------------------------------------------
# factory
# ---------------------------------------------------------------------------
def build_step(cfg, model, txs, disc=None, disc_aux=None,
               rain_model=None, centroids_loaded: bool = False) -> Callable:
    m = cfg.method
    if m == "baseline":
        return make_baseline_step(cfg, model, txs)
    if m == "adaptseg":
        return make_adaptseg_step(cfg, model, disc, disc_aux, txs)
    if m == "advent":
        return make_advent_step(cfg, model, disc, disc_aux, txs)
    if m in ("mpscl", "slcl"):
        return make_mpscl_step(cfg, model, disc, disc_aux, txs,
                               centroids_loaded=centroids_loaded)
    if m == "mccl":
        return make_mccl_step(cfg, model, txs, rain_model=rain_model,
                              centroids_loaded=centroids_loaded)
    if m == "rain":
        from .steps_rain import make_rain_seg_step
        return make_rain_seg_step(cfg, model, rain_model, txs)
    if m == "pretrain_rain":
        from .steps_rain import make_pretrain_rain_step
        return make_pretrain_rain_step(cfg, rain_model, txs)
    raise ValueError(f"unknown method {m!r}")


# ---------------------------------------------------------------------------
# multi-step driver: scan K steps inside one jit
# ---------------------------------------------------------------------------
def make_multi_step(step_fn: Callable) -> Callable:
    """Wrap a jitted ``step(state, batch, sched) -> (state, metrics)`` into a
    driver that consumes K device-resident batches in ONE dispatch via
    ``lax.scan`` — the TPU-idiomatic step-in-scan pattern (K is inferred from
    the stacked leading axis). Each launch costs one host->device round trip
    instead of K, hiding dispatch latency (the dominant overhead on
    tunneled/remote TPUs) and letting XLA overlap the inter-step gaps; the
    batches arrive stacked ``(K, ...)`` (the trainer builds them with the
    same device_prefetch queue; cfg.run.scan_steps picks K).

    Returns ``multi(state, stacked_batches, sched) -> (state, metrics)``
    where metrics are averaged over the K steps.
    """

    @functools.partial(jax.jit, donate_argnums=0)
    def multi(state: TrainState, batches: Dict[str, Array],
              sched: Dict[str, Array]):
        def body(carry, batch):
            new_state, metrics = step_fn(carry, batch, sched)
            return new_state, metrics

        state, metrics = jax.lax.scan(body, state, batches)
        return state, {key: jnp.mean(v, axis=0) for key, v in metrics.items()}

    return multi
