"""Unified training state: one PyTree for everything a step mutates.

Replaces the reference's scattered mutable trainer attributes (model/optimizer
objects, ``self.centroid_s`` EMA buffers, RAIN ``sampling`` vector, python
RNG) with a single flax struct so orbax checkpointing and pjit sharding are
uniform (SURVEY §7 design note).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

Array = jax.Array


@struct.dataclass
class NetState:
    params: Any
    batch_stats: Any
    opt_state: Any


@struct.dataclass
class TrainState:
    step: Array                       # global step counter
    rng: Array                        # PRNG key threaded through steps
    seg: NetState                     # segmentor
    d_main: Optional[NetState] = None # main discriminator (adversarial methods)
    d_aux: Optional[NetState] = None  # aux discriminator (multilvl)
    centroids: Optional[Array] = None # (C, F) EMA class centers / src centroids
    sampling: Optional[Array] = None  # RAIN epsilon (VAE sampling) vector
    extra: Any = None                 # method-specific leaves (e.g. DDF nets)


def make_optimizer(name: str, lr: float = 1.0, momentum: float = 0.9,
                   weight_decay: float = 0.0, betas=(0.9, 0.999),
                   lr10_keys: tuple = ()) -> optax.GradientTransformation:
    """SGD/Adam matching the reference recipes (Trainer_baseline.py:169-187,
    Trainer_AdaptSeg.py:92-117: Adam(lr_dis, betas=(0.9, 0.99))).

    The learning rate is injected per-epoch via ``inject_hyperparams`` so the
    jitted step stays compiled across LR changes.

    ``lr10_keys``: top-level param-tree keys updated at 10x the base LR —
    the reference DeepLab convention of a 10x classifier-head group
    (model/deeplabv2.py:138-175 optim_parameters, lr_adjust.py:15-16
    ``param_groups[1]['lr'] = lr * 10``). Implemented as a masked
    ``optax.scale(10)`` after the base update, which is exactly a 10x LR
    for that group (weight decay included).
    """
    def build(learning_rate):
        if name == "sgd":
            tx = optax.chain(
                optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
                optax.sgd(learning_rate, momentum=momentum),
            )
        elif name == "adam":
            tx = optax.adam(learning_rate, b1=betas[0], b2=betas[1])
        else:
            raise ValueError(f"unknown optimizer {name!r}")
        if lr10_keys:
            def mask(tree):
                return {k: jax.tree.map(lambda _: k in lr10_keys, v)
                        for k, v in tree.items()}
            tx = optax.chain(tx, optax.masked(optax.scale(10.0), mask))
        return tx
    return optax.inject_hyperparams(build)(learning_rate=lr)


def set_lr(opt_state, lr: float):
    """Update the injected learning rate inside an inject_hyperparams state."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def init_net(model, rng: Array, sample_input: Array, tx,
             train_kwarg: bool = True) -> NetState:
    if train_kwarg:
        variables = model.init(rng, sample_input, True)
    else:
        variables = model.init(rng, sample_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return NetState(params=params, batch_stats=batch_stats,
                    opt_state=tx.init(params))


def create_train_state(cfg, model, *, disc=None, disc_aux=None,
                       sample_shape=(1, 224, 224, 3),
                       centroids: Optional[Array] = None,
                       seed: Optional[int] = None) -> tuple:
    """Build (state, txs) where txs is a dict of optax transforms keyed
    by net name ('seg', 'd_main', 'd_aux')."""
    seed = cfg.run.seed if seed is None else seed
    rng = jax.random.PRNGKey(seed)
    k_seg, k_d, k_da, k_state = jax.random.split(rng, 4)

    # 10x classifier-head LR group for the DeepLab backbones (reference
    # optim_parameters, model/deeplabv2.py:173-175)
    lr10 = (("layer5", "layer6")
            if cfg.model.backbone.lower() in ("deeplabv2", "deeplab") else ())
    txs = {"seg": make_optimizer(cfg.optim.optimizer, cfg.optim.lr,
                                 momentum=cfg.optim.momentum,
                                 weight_decay=cfg.optim.weight_decay,
                                 lr10_keys=lr10)}
    x = jnp.zeros(sample_shape, jnp.float32)
    seg = init_net(model, k_seg, x, txs["seg"])

    d_main = d_aux = None
    if disc is not None:
        txs["d_main"] = make_optimizer("adam", cfg.optim.lr_dis, betas=(cfg.adv.mmt1, cfg.adv.mmt))
        dx = jnp.zeros(sample_shape[:3] + (cfg.model.num_classes,), jnp.float32)
        d_main = init_net(disc, k_d, dx, txs["d_main"], train_kwarg=False)
    if disc_aux is not None:
        txs["d_aux"] = make_optimizer("adam", cfg.optim.lr_dis, betas=(cfg.adv.mmt1, cfg.adv.mmt))
        dx = jnp.zeros(sample_shape[:3] + (cfg.model.num_classes,), jnp.float32)
        d_aux = init_net(disc_aux, k_da, dx, txs["d_aux"], train_kwarg=False)

    state = TrainState(step=jnp.zeros((), jnp.int32), rng=k_state, seg=seg,
                       d_main=d_main, d_aux=d_aux, centroids=centroids)
    return state, txs
