"""RAIN training steps: style-net pretraining and RAIN-augmented segmentation.

  pretrain step   — reference Pretrainer_RAIN.train_epoch (:124-177): one
                    shared forward, fc nets stepped on lw*KL + rw*recon and
                    the decoder on cw*content + sw*style; the staged
                    retain-graph backward is reproduced by the surgical
                    stop_gradient inside RAIN.losses.
  rain seg step   — reference Trainer_RAIN.train_epoch (:89-150): stylize
                    source->target style, consistency MSE between the
                    bottlenecks of source and stylized-source, CE+Jaccard on
                    [stylized, source], and the epsilon ascent
                    ``sampling += (lr_eps / loss_seg) * d(loss_seg)/d(sampling)``
                    — in JAX just a second grad of the same jitted loss.

Each call performs ONE epsilon iteration (matching the reference, which runs
``opt.step()`` inside the eps loop); the trainer re-invokes it ``eps_iters``
times per batch after warmup, carrying ``sampling`` in the state.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..ops import losses as L
from .state import NetState, TrainState
from .steps import _apply_seg, clip_step_norm

Array = jax.Array


def stylized_to_gray3(img_style: Array) -> Array:
    """mean over channels -> 3-channel stack (Trainer_RAIN.py:103-113)."""
    g = jnp.mean(img_style, axis=-1, keepdims=True)
    return jnp.concatenate([g, g, g], axis=-1)


def make_pretrain_rain_step(cfg, rain_model, txs) -> Callable:
    r = cfg.rain

    @jax.jit
    def step(state: TrainState, batch: Dict[str, Array], sched: Dict[str, Array]):
        rng, rng_noise = jax.random.split(state.rng)

        def loss_fn(params):
            (loss_c, loss_s, loss_l, loss_r) = rain_model.apply(
                {"params": params}, batch["img_s"], batch["img_t"],
                method="losses", rngs={"noise": rng_noise})
            total = (r.content_weight * loss_c + r.style_weight * loss_s
                     + r.latent_weight * loss_l + r.recon_weight * loss_r)
            return total, {"loss_c": loss_c, "loss_s": loss_s,
                           "loss_l": loss_l, "loss_r": loss_r}

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.seg.params)
        # the frozen VGG encoder receives no updates (zero its grads so Adam
        # moments stay clean)
        grads = jax.tree_util.tree_map_with_path(
            lambda path, g: jnp.zeros_like(g)
            if any(getattr(k, "key", None) == "encoder" for k in path) else g,
            grads)
        opt_state = state.seg.opt_state
        opt_state.hyperparams["learning_rate"] = sched["lr"]
        updates, new_opt = txs["seg"].update(grads, opt_state, state.seg.params)
        params = optax.apply_updates(state.seg.params, updates)
        new_state = state.replace(step=state.step + 1, rng=rng,
                                  seg=NetState(params=params, batch_stats={},
                                               opt_state=new_opt))
        return new_state, metrics

    return step


def make_rain_seg_step(cfg, seg_model, rain_model, txs) -> Callable:
    """One (eps-)iteration of RAIN-augmented supervised segmentation.

    state.extra holds the RAIN params (frozen during seg training, reference
    Trainer_RAIN.prepare_model loads them pretrained); state.sampling holds
    the current epsilon sampling vector.
    ``sched['fresh']`` = 1.0 -> draw a fresh sampling (start of a batch);
    ``sched['eps_on']`` = 1.0 -> apply the epsilon ascent after the update.
    """
    consist_w = cfg.rain.consist_w
    lr_eps = cfg.optim.lr_eps

    @jax.jit
    def step(state: TrainState, batch: Dict[str, Array], sched: Dict[str, Array]):
        rng, rng_noise = jax.random.split(state.rng)
        rain_params = state.extra["rain"]
        img_s, labels_s = batch["img_s"], batch["lab_s"]
        img_t = batch["img_t"]
        # default single-style recipe: content img_s[0:1], style img_t[0:1]
        rain_content, rain_style = img_s[0:1], img_t[0:1]

        # fresh sampling for this batch (or keep the carried one)
        _, fresh_sampling = rain_model.apply(
            {"params": rain_params}, rain_content, rain_style, None,
            method="style_transfer", rngs={"noise": rng_noise})
        sampling = jnp.where(sched["fresh"] > 0, fresh_sampling, state.sampling)

        def seg_losses(params, sampling):
            img_style, _ = rain_model.apply(
                {"params": rain_params}, rain_content, rain_style, sampling,
                method="style_transfer", rngs={"noise": rng_noise})
            img_style = stylized_to_gray3(img_style)
            x = jnp.concatenate([img_style, img_s], axis=0)
            out, new_bs = _apply_seg(seg_model, state.seg.replace(params=params), x)
            style_size = img_style.shape[0]
            b_style = out.bottleneck[:style_size]
            b_s = out.bottleneck[style_size:2 * style_size]
            loss_consist = jnp.mean((b_s.astype(jnp.float32)
                                     - b_style.astype(jnp.float32)) ** 2)
            label_cat = jnp.concatenate([labels_s[:style_size], labels_s], axis=0)
            loss_seg = L.loss_calc(out.pred, label_cat, jaccard=True)
            return loss_seg, (loss_consist, new_bs)

        # ONE forward, two backwards off the same linearization — the
        # functional equivalent of the reference's retain_graph reuse
        # (Trainer_RAIN.py:133-147): cotangent (1,0) differentiates the full
        # training loss; (0,1) gives d(loss_seg)/d(sampling) for the epsilon
        # ascent (the consistency term is excluded, matching the reference's
        # samp_loss = the seg loss alone).
        def both(params, sampling):
            loss_seg, (loss_consist, new_bs) = seg_losses(params, sampling)
            total = loss_seg + consist_w * loss_consist
            return (total, loss_seg), (loss_consist, new_bs)

        ((_total, loss_seg), vjp_fn, (loss_consist, new_bs)) = jax.vjp(
            both, state.seg.params, sampling, has_aux=True)
        one = jnp.ones_like(loss_seg)
        zero = jnp.zeros_like(loss_seg)
        grads, _ = vjp_fn((one, zero))
        _, g_samp_seg = vjp_fn((zero, one))

        opt_state = state.seg.opt_state
        opt_state.hyperparams["learning_rate"] = sched["lr"]
        updates, new_opt = txs["seg"].update(grads, opt_state, state.seg.params)
        params = optax.apply_updates(state.seg.params, updates)

        step_vec = (lr_eps / jax.lax.stop_gradient(loss_seg)) * g_samp_seg
        if cfg.rain.eps_clip > 0:
            # same bounded-ascent repair as the MCCL rain branch
            # (steps.clip_step_norm; 0 = reference-exact unbounded)
            step_vec = clip_step_norm(step_vec, cfg.rain.eps_clip)
        new_sampling = jnp.where(
            sched["eps_on"] > 0, sampling + step_vec, sampling)

        metrics = {"seg": loss_seg, "loss_consist": loss_consist}
        new_state = state.replace(
            step=state.step + 1, rng=rng,
            seg=NetState(params=params, batch_stats=new_bs, opt_state=new_opt),
            sampling=new_sampling)
        return new_state, metrics

    return step
