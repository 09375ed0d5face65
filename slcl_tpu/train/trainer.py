"""Training orchestration: the functional replacement of the trainer tower.

One :class:`Trainer` drives every method (baseline/adaptseg/advent/mpscl/
mccl): it builds the model + discriminators + jitted step from ``cfg.method``,
runs the epoch loop with per-epoch LR adjustment (reference
Trainer_AdaptSeg.py:119-127), per-epoch target-domain validation with
best-checkpointing (Trainer_MPSCL.py:335-403), dice-plateau early stopping +
wall-clock budget (Trainer.py:23,209-224), and orbax checkpoints of the whole
:class:`TrainState` PyTree (params + optimizer states + EMA centroids + RNG).
"""
from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, build_apdx
from ..data.loader import Loader, zip_domains
from ..eval.evaluator import Evaluator, mean_fg_dice
from ..models import UncertaintyDiscriminator, build_segmentor
from . import schedules
from .state import TrainState, create_train_state
from .steps import build_step

_ADVERSARIAL = ("adaptseg", "advent", "mpscl", "slcl")


def stylized_branch_triggers(history, first_epochs: int = 6,
                             style_floor: float = 0.05,
                             src_ceiling: float = 0.85):
    """Detect the unlearnable-stylized-class collapse signature (round-5
    root cause of the seed-13 MCCL+RAIN co-train regression, documented in
    examples/README.md): a stylized-branch class dice pinned ~0 through the
    first training epochs while the source branch saturates means the
    RAIN-stylized view of that class is too far for the net to fit — the
    run resolves the conflict by overfitting the source domain and target
    dice collapses (observed 0.410 vs 0.727 with ``rain.style_alpha=0.5``).

    ``history`` is the trainer's per-epoch record list (the diagnostics are
    logged by ``make_mccl_step`` when RAIN is enabled). Returns one warning
    string per triggered class; empty when healthy or not applicable.
    Mirrors ``tools/rain_diag.py::trigger_check`` for offline logs.
    """
    early = [r for r in history if 0 < r.get("epoch", -1) < first_epochs]
    if len(early) < first_epochs - 1:
        return []
    out = []
    for c in (1, 2, 3):
        sty = [r.get(f"dice_style_c{c}") for r in early]
        src = [r.get(f"dice_src_c{c}") for r in early]
        if any(v is None for v in sty + src):
            continue
        if max(sty) < style_floor and max(src) > src_ceiling:
            out.append(
                f"stylized-branch warning: dice_style_c{c} never exceeded "
                f"{max(sty):.3f} over epochs 1-{first_epochs - 1} while "
                f"dice_src_c{c} reached {max(src):.3f} — the stylized view "
                "of this class is unlearnable at the current strength and "
                "the run is at risk of source-overfit collapse; set "
                "rain.style_alpha=0.5 (or lower) or fine-tune from a "
                "converged plain-MCCL checkpoint (examples/README.md, "
                "'Round-5 root cause').")
    return out


def dataclasses_replace_fold(cfg: Config) -> Config:
    """Copy of ``cfg`` pointing at the other MMWHS cross-validation fold
    (the baseline's final test covers both folds, Trainer_baseline.py:308-339)."""
    import copy
    other = copy.deepcopy(cfg)
    other.data.fold = 1 - cfg.data.fold
    return other


class Trainer:
    def __init__(self, cfg: Config, datasets: Optional[Dict[str, Any]] = None):
        """``datasets``: dict with keys 'train_s', 'train_t', 'valid_t',
        'test_t' (dataset objects with __len__/__getitem__). When None, the
        synthetic dataset is used (cfg.data.dataset == 'synthetic')."""
        self.cfg = cfg
        # method-implied data requirements (mirrors the reference entry
        # scripts' hardcoded flags) — must precede dataset construction
        if cfg.method == "mccl" and not cfg.data.aug_counter:
            cfg.data.aug_counter = True
        if cfg.method == "adaptevery" and not cfg.data.vert:
            cfg.data.vert = True
        self.apdx = build_apdx(cfg)
        # created lazily (train()/save_checkpoint): eval-only consumers of a
        # Trainer (gen_class_centers, export, evaluate) must not litter
        # empty run dirs
        self.out_dir = Path(cfg.run.out_dir) / self.apdx
        self.datasets = datasets or self._default_datasets()
        self._build()
        self.history: list = []
        self.best_score = -np.inf
        self.best_epoch = -1
        self.start_time = time.time()
        self.longest_epoch = 0.0

    # ------------------------------------------------------------------
    def _default_datasets(self):
        from .. import data as data_mod
        return data_mod.prepare_datasets(self.cfg)

    def _build(self):
        cfg = self.cfg
        import jax as _jax
        self.rain_model = None
        rain_params = None
        if cfg.rain.enabled or cfg.method in ("rain", "pretrain_rain"):
            from ..models.rain import RAIN
            self.rain_model = RAIN()
            x0 = jnp.zeros((1, cfg.data.crop, cfg.data.crop, 3), jnp.float32)
            rv = self.rain_model.init(
                {"params": _jax.random.PRNGKey(cfg.run.seed + 7),
                 "noise": _jax.random.PRNGKey(cfg.run.seed + 8)}, x0, x0)
            rain_params = rv["params"]
            from ..utils import torch_convert as tc
            converters = {"encoder": tc.convert_vgg_rain_encoder,
                          "decoder": tc.convert_rain_decoder,
                          "fc_encoder": tc.convert_rain_fc,
                          "fc_decoder": tc.convert_rain_fc}
            for name, path in (("encoder", cfg.rain.vgg_ckpt),
                               ("decoder", cfg.rain.decoder_ckpt),
                               ("fc_encoder", cfg.rain.fc_encoder_ckpt),
                               ("fc_decoder", cfg.rain.fc_decoder_ckpt)):
                if path and not os.path.exists(path):
                    # a configured-but-missing checkpoint must not silently
                    # fall back to random init (it invalidates any RAIN run)
                    raise FileNotFoundError(
                        f"rain.{name} checkpoint not found: {path!r}")
                if path:
                    if str(path).endswith((".pth", ".pt")):
                        # torch checkpoints (reference load_rain_models
                        # inputs, model/RAIN.py:124-157) convert on the fly
                        sub = converters[name](tc.load_state_dict(path))
                    else:
                        sub = tc.load_tree_npz(path)["params"]
                    merged, report = tc.merge_pretrained(rain_params[name], sub)
                    rain_params = dict(rain_params)
                    rain_params[name] = _jax.tree.map(jnp.asarray, merged)
                    n_loaded = sum(not r.startswith("!") for r in report)
                    print(f"[rain] loaded {n_loaded} tensors into {name} "
                          f"from {path}")
        self._rain_params = rain_params

        if cfg.method == "pretrain_rain":
            # the RAIN net itself is the trained network
            from .state import NetState, TrainState, make_optimizer
            tx = make_optimizer("adam", cfg.optim.lr)
            self.txs = {"seg": tx}
            self.state = TrainState(
                step=jnp.zeros((), jnp.int32),
                rng=_jax.random.PRNGKey(cfg.run.seed),
                seg=NetState(params=rain_params, batch_stats={},
                             opt_state=tx.init(rain_params)))
            self.model = self.rain_model
            self.disc = self.disc_aux = None
            self.step_fn = build_step(cfg, None, self.txs,
                                      rain_model=self.rain_model)
            self.evaluator = None
            return

        if cfg.method == "ddfseg":
            self._build_ddfseg()
            return
        if cfg.method == "adaptevery":
            self._build_adaptevery()
            return
        if cfg.method == "bcl":
            self._build_bcl()
            return

        self.model = build_segmentor(cfg.model)
        disc = disc_aux = None
        if cfg.method in _ADVERSARIAL:
            disc = UncertaintyDiscriminator()
            if cfg.model.multilvl:
                disc_aux = UncertaintyDiscriminator()
        self.disc, self.disc_aux = disc, disc_aux

        centroids = None
        self._centroids_loaded = False
        if cfg.method in ("mpscl", "slcl", "mccl"):
            if cfg.contrastive.init_centers:
                # a configured-but-missing center file must not silently
                # degrade to the zero-init bootstrap (same hazard class as
                # the missing-RAIN-ckpt bug, examples/README.md)
                if not os.path.exists(cfg.contrastive.init_centers):
                    raise FileNotFoundError(
                        f"contrastive.init_centers="
                        f"{cfg.contrastive.init_centers!r} does not exist "
                        "(generate with scripts/gen_class_centers.py)")
                centroids = jnp.asarray(np.load(cfg.contrastive.init_centers),
                                        jnp.float32)
                self._centroids_loaded = True
            else:
                # documented fallback: zero-init centers (reference loads
                # class_center_{mod}_f{fold}.npy, Trainer_MPSCL.py:306-331);
                # the jitted steps adopt the first batch means outright
                # (bootstrap) so the EMA never sees the zero placeholder.
                # Seeding MCCL here (instead of a None leaf) keeps the state
                # PyTree structure fixed — a None->array flip between step 1
                # and step 2 would retrace and recompile the step.
                centroids = jnp.zeros((cfg.model.num_classes, cfg.model.filters),
                                      jnp.float32)

        sample_shape = (1, cfg.data.crop, cfg.data.crop, cfg.model.in_channels)
        self.state, self.txs = create_train_state(
            cfg, self.model, disc=disc, disc_aux=disc_aux,
            sample_shape=sample_shape, centroids=centroids)
        self._load_pretrained_encoder()
        if self._rain_params is not None:
            # sampling rows = stylized images: bs under mulstyle (whole-batch
            # styles), else 1 (Trainer_MCCL.py:196-202 operand shapes)
            n_sty = cfg.data.bs if (cfg.rain.mulstyle
                                    and not cfg.rain.mulstyle2) else 1
            self.state = self.state.replace(
                extra={"rain": self._rain_params},
                sampling=jnp.zeros((n_sty, 512), jnp.float32))
        self.step_fn = build_step(cfg, self.model, self.txs, disc, disc_aux,
                                  rain_model=self.rain_model,
                                  centroids_loaded=self._centroids_loaded)
        self.evaluator = Evaluator(self.model, eval_bs=cfg.data.eval_bs,
                                   klc=cfg.run.klc,
                                   num_classes=cfg.model.num_classes)
        self._setup_mesh()

    def _load_pretrained_encoder(self):
        """ImageNet (or any torchvision-format) encoder init for the
        ResNet-backed segmentors — the smp ``encoder_weights='imagenet'``
        equivalent (reference model/segmentation_models.py:26-33,
        train_baseline.py:27-42 hardcodes ``pretrained``)."""
        cfg = self.cfg
        if not cfg.model.pretrained:
            return
        backbone = cfg.model.backbone.lower()
        if backbone not in ("resnet50_unet", "resnet50", "deeplabv2"):
            print(f"[pretrained] backbone {backbone!r} has no ImageNet "
                  "encoder import; training from scratch")
            return
        path = cfg.model.pretrained_ckpt
        if not path or not os.path.exists(path):
            print("[pretrained] model.pretrained=true but no checkpoint at "
                  f"{path!r} (set model.pretrained_ckpt to a torchvision "
                  "resnet .pth or a converted .npz); training from scratch")
            return
        from ..utils import torch_convert as tc
        layers = tuple(cfg.model.layers) or None
        enc_params, enc_bstats = tc.load_pretrained_encoder(
            path, backbone, layers)
        params, report = tc.merge_pretrained(self.state.seg.params, enc_params)
        bstats = self.state.seg.batch_stats
        if enc_bstats:
            bstats, brep = tc.merge_pretrained(bstats, enc_bstats)
            report += brep
        params = jax.tree.map(jnp.asarray, params)
        bstats = jax.tree.map(jnp.asarray, bstats)
        self.state = self.state.replace(
            seg=self.state.seg.replace(params=params, batch_stats=bstats))
        missing = [r for r in report if r.startswith("!")]
        print(f"[pretrained] loaded {len(report) - len(missing)} tensors "
              f"from {path}" + (f"; unmatched: {missing}" if missing else ""))

    def _setup_mesh(self):
        """Data-parallel mesh when >1 device: replicate the state, shard
        batches over the 'data' axis (XLA inserts the collectives). The
        global batch cfg.data.bs is divided across chips by sharding, so
        recipes keep their semantics."""
        self.mesh = None
        if len(jax.devices()) <= 1 or self.cfg.method in ("pretrain_rain",):
            return
        from ..parallel.mesh import (fsdp_shard_state, make_mesh,
                                     replicate_state)
        n = len(jax.devices())
        model_axis = max(self.cfg.mesh.model_axis, 1)
        if n % model_axis != 0:
            print(f"[mesh] {n} devices not divisible by model_axis "
                  f"{model_axis}; staying single-device")
            return
        if self.cfg.data.bs % (n // model_axis) != 0:
            print(f"[mesh] global batch {self.cfg.data.bs} not divisible by "
                  f"{n // model_axis} data-axis devices; staying "
                  "single-device")
            return
        self.mesh = make_mesh(n, model_axis=model_axis)
        if self.cfg.mesh.fsdp and model_axis > 1:
            self.state = fsdp_shard_state(self.state, self.mesh,
                                          min_size=self.cfg.mesh.fsdp_min_size)
            kind = "dp+fsdp"
        else:
            self.state = replicate_state(self.state, self.mesh)
            kind = "data-parallel"
        if self.cfg.mesh.spatial and model_axis > 1:
            kind += "+sp"
        print(f"[mesh] {kind} over {n} devices "
              f"(mesh {dict(self.mesh.shape)})")

    # ------------------------------------------------------------------
    def _build_ddfseg(self):
        """DDFNet + SegDecoder + 3 PatchGAN discriminators
        (reference Trainer_DDFSeg.prepare_model:55-112)."""
        import jax as _jax
        from ..models.ddfseg import DDFNet, SegDecoder
        from ..models.discriminators import PatchGAN
        from .state import NetState, TrainState, make_optimizer
        from .steps_extra import make_ddfseg_step
        cfg = self.cfg
        H = cfg.data.crop
        k = _jax.random.split(_jax.random.PRNGKey(cfg.run.seed), 8)
        self.ddfnet = DDFNet(filters=cfg.ddfseg.filters,
                             style_filters=cfg.ddfseg.style_filters,
                             ngf=cfg.ddfseg.ngf, slim=cfg.ddfseg.slim)
        self.segdecoder = SegDecoder(num_classes=cfg.model.num_classes,
                                     ngf=cfg.ddfseg.ngf, slim=cfg.ddfseg.slim)
        imgs = jnp.zeros((1, H, H, 3), jnp.float32)
        dv = self.ddfnet.init({"params": k[0], "dropout": k[1]}, imgs, imgs, True)
        content_ch = 32 * cfg.ddfseg.filters
        sv = self.segdecoder.init({"params": k[2], "dropout": k[3]},
                                  jnp.zeros((1, H // 8, H // 8, content_ch)),
                                  True)
        params = {"ddfnet": dv["params"], "segdecoder": sv["params"]}
        bstats = {"ddfnet": dv.get("batch_stats", {}),
                  "segdecoder": sv.get("batch_stats", {})}
        tx = make_optimizer("adam", cfg.optim.lr)
        d_t = PatchGAN()
        d_s = PatchGAN(aux=True)
        d_seg = PatchGAN()
        tx_d = lambda: make_optimizer("adam", cfg.optim.lr_dis, betas=(cfg.adv.mmt1, cfg.adv.mmt))
        self.txs = {"seg": tx, "d_main": tx_d(), "d_aux": tx_d(),
                    "d_seg": tx_d()}

        def netstate(model, key, shape, tx):
            v = model.init({"params": key}, jnp.zeros(shape, jnp.float32))
            return NetState(params=v["params"],
                            batch_stats=v.get("batch_stats", {}),
                            opt_state=tx.init(v["params"]))

        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), rng=_jax.random.PRNGKey(cfg.run.seed),
            seg=NetState(params=params, batch_stats=bstats,
                         opt_state=tx.init(params)),
            d_main=netstate(d_t, k[4], (1, H, H, 1), self.txs["d_main"]),
            d_aux=netstate(d_s, k[5], (1, H, H, 1), self.txs["d_aux"]),
            extra={"d_seg": netstate(d_seg, k[6], (1, H, H, cfg.model.num_classes),
                                     self.txs["d_seg"])})
        self.step_fn = make_ddfseg_step(cfg, self.ddfnet, self.segdecoder,
                                        d_s, d_t, d_seg, self.txs)
        self._setup_mesh()
        # eval path: SegDecoder(content_encoder_s(x))
        ddfnet, segdecoder = self.ddfnet, self.segdecoder

        class _EvalWrap:
            def apply(_self, variables, x, train=False):
                p = variables["params"]
                bs = variables.get("batch_stats", {})
                content = ddfnet.apply(
                    {"params": p["ddfnet"], "batch_stats": bs.get("ddfnet", {})},
                    x, method="content_s", train=False)
                pred = segdecoder.apply(
                    {"params": p["segdecoder"],
                     "batch_stats": bs.get("segdecoder", {})}, content, False)
                from ..models.common import SegOutput
                return SegOutput(pred=pred, aux=None, dcdr_ft=pred)

        self.evaluator = Evaluator(_EvalWrap(), eval_bs=cfg.data.eval_bs,
                                   klc=cfg.run.klc,
                                   num_classes=cfg.model.num_classes)
        self.disc = self.disc_aux = None
        self.rain_model = None

    def _build_adaptevery(self):
        """ResNetUNetPoint + 4 discriminators (Trainer_AdaptEvery:51-110)."""
        import jax as _jax
        from ..models.pointnet import PointNetCls
        from ..models.resnet_unet import ResNetUNetPoint
        from .state import NetState, TrainState, make_optimizer
        from .steps_extra import make_adaptevery_step
        cfg = self.cfg
        H = cfg.data.crop
        k = _jax.random.split(_jax.random.PRNGKey(cfg.run.seed), 8)
        layers = tuple(cfg.model.layers) or (3, 4, 6, 3)
        base = cfg.model.base
        kw = {}
        if base != 64:  # CI/dryrun width knob (scale the decoder to match)
            kw = {"base": base,
                  "decoder_channels": tuple(max(2, base * 4 >> i)
                                            for i in range(5))}
        self.model = ResNetUNetPoint(num_classes=cfg.model.num_classes,
                                     layers=layers, **kw)
        v = self.model.init({"params": k[0], "dropout": k[1]},
                            jnp.zeros((1, H, H, 3), jnp.float32), True)
        tx = make_optimizer(cfg.optim.optimizer, cfg.optim.lr,
                            momentum=cfg.optim.momentum,
                            weight_decay=cfg.optim.weight_decay)
        tx_d = lambda: make_optimizer("adam", cfg.optim.lr_dis, betas=(cfg.adv.mmt1, cfg.adv.mmt))
        self.txs = {"seg": tx, "d_main": tx_d(), "d_aux": tx_d(),
                    "d_ent": tx_d(), "d_point": tx_d()}
        d_main, d_aux, d_ent = (UncertaintyDiscriminator(base=base)
                                for _ in range(3))
        d_point = PointNetCls(k=1, base=base)

        def netstate(model, key, shape, tx, rngs_extra=None, train_arg=False):
            rngs = {"params": key}
            if rngs_extra:
                rngs.update(rngs_extra)
            args = (jnp.zeros(shape, jnp.float32),) + ((True,) if train_arg else ())
            vv = model.init(rngs, *args)
            return NetState(params=vv["params"],
                            batch_stats=vv.get("batch_stats", {}),
                            opt_state=tx.init(vv["params"]))

        dshape = (1, H, H, cfg.model.num_classes)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), rng=_jax.random.PRNGKey(cfg.run.seed),
            seg=NetState(params=v["params"],
                         batch_stats=v.get("batch_stats", {}),
                         opt_state=tx.init(v["params"])),
            d_main=netstate(d_main, k[2], dshape, self.txs["d_main"]),
            d_aux=netstate(d_aux, k[3], dshape, self.txs["d_aux"]),
            extra={"d_ent": netstate(d_ent, k[4], dshape, self.txs["d_ent"]),
                   "d_point": netstate(d_point, k[5], (1, 300, 3),
                                       self.txs["d_point"],
                                       rngs_extra={"dropout": k[6]},
                                       train_arg=True)})
        self.step_fn = make_adaptevery_step(cfg, self.model, d_main, d_aux,
                                            d_ent, d_point, self.txs)
        self._setup_mesh()
        model = self.model

        class _EvalWrap:
            def apply(_self, variables, x, train=False):
                out, _vert = model.apply(variables, x, False)
                return out

        self.evaluator = Evaluator(_EvalWrap(), eval_bs=cfg.data.eval_bs,
                                   klc=cfg.run.klc,
                                   num_classes=cfg.model.num_classes)
        self.disc = self.disc_aux = None
        self.rain_model = None

    def _build_bcl(self):
        """BCLDeepLab + per-round pseudo-labels (Trainer_BCL)."""
        import jax as _jax
        from ..models.deeplabv2 import BCLDeepLab
        from .state import NetState, TrainState, make_optimizer
        from .steps_extra import make_bcl_step
        cfg = self.cfg
        H = cfg.data.crop
        layers = tuple(cfg.model.layers) or (3, 4, 23, 3)
        self.model = BCLDeepLab(num_classes=cfg.model.num_classes,
                                layers=layers, base=cfg.model.base)
        v = self.model.init(_jax.random.PRNGKey(cfg.run.seed),
                            jnp.zeros((1, H, H, 3), jnp.float32), True, True)
        tx = make_optimizer("sgd", cfg.optim.lr, momentum=cfg.optim.momentum,
                            weight_decay=cfg.optim.weight_decay)
        self.txs = {"seg": tx}
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), rng=_jax.random.PRNGKey(cfg.run.seed),
            seg=NetState(params=v["params"],
                         batch_stats=v.get("batch_stats", {}),
                         opt_state=tx.init(v["params"])))
        self.step_fn = make_bcl_step(cfg, self.model, self.txs)
        self._setup_mesh()
        self._bcl_plabels: Dict[str, np.ndarray] = {}
        model = self.model

        class _EvalWrap:
            def apply(_self, variables, x, train=False):
                pred, feat = model.apply(variables, x, False, False)
                from ..models.common import SegOutput
                return SegOutput(pred=pred, aux=None, dcdr_ft=feat)

        self.evaluator = Evaluator(_EvalWrap(), eval_bs=cfg.data.eval_bs,
                                   klc=cfg.run.klc,
                                   num_classes=cfg.model.num_classes)
        self.disc = self.disc_aux = None
        self.rain_model = None

    def _bcl_update_plabels(self, prop: float = 0.5):
        """Per-round class-balanced pseudo-label generation
        (Trainer_BCL.gene_thres + save_pred intent, :102-220)."""
        import jax as _jax
        from ..ops.centroids import gene_thres, thres_cb_plabel
        cfg = self.cfg
        loader = Loader(self.datasets["train_t"], cfg.data.eval_bs,
                        shuffle=False, drop_last=False,
                        num_threads=cfg.data.num_workers)
        variables = {"params": self.state.seg.params}
        if self.state.seg.batch_stats:
            variables["batch_stats"] = self.state.seg.batch_stats

        @_jax.jit
        def infer(variables, x):
            pred, _ = self.model.apply(variables, x, False, False)
            return _jax.nn.softmax(pred.astype(jnp.float32), axis=-1)

        all_probs, all_names = [], []
        for img, _lab, names in loader:
            p = np.asarray(infer(variables, jnp.asarray(img)))
            all_probs.append(p)
            all_names.extend(names)
        probs = np.concatenate(all_probs)
        conf = probs.max(-1).ravel()
        pred = probs.argmax(-1).ravel()
        th = gene_thres(conf, pred, prop, cfg.model.num_classes)
        for i, name in enumerate(all_names):
            plab, _mask = thres_cb_plabel(jnp.asarray(probs[i]), th,
                                          cfg.model.num_classes)
            self._bcl_plabels[name] = np.asarray(plab, np.int32)

    # ------------------------------------------------------------------
    def _sched(self, epoch: int) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        lr = schedules.get_lr(cfg.optim.lr_decay_method, cfg.optim.lr, epoch,
                              cfg.optim.epochs, cfg.optim.power,
                              cfg.optim.lr_end, cfg.optim.lr_decay)
        if 0 <= epoch < cfg.optim.lr_warmup_epochs:
            lr = lr * (epoch + 1) / cfg.optim.lr_warmup_epochs
        # D LR decays only when adjust_lr_dis is set; the reference default
        # keeps it constant (Trainer_AdaptSeg.py:119-127)
        if cfg.optim.adjust_lr_dis:
            lr_dis = schedules.get_lr(cfg.optim.lr_decay_method,
                                      cfg.optim.lr_dis, epoch,
                                      cfg.optim.epochs, cfg.optim.power)
        else:
            lr_dis = cfg.optim.lr_dis
        warm = 1.0 if epoch >= cfg.contrastive.warmup_epochs else 0.0
        eps_on = 1.0 if (warm > 0 and cfg.rain.enabled
                         and cfg.rain.update_eps) else 0.0
        return {"lr": jnp.asarray(lr, jnp.float32),
                "lr_dis": jnp.asarray(lr_dis, jnp.float32),
                "warm": jnp.asarray(warm, jnp.float32),
                "fresh": jnp.asarray(1.0, jnp.float32),
                "eps_on": jnp.asarray(eps_on, jnp.float32)}

    def _epoch_batches(self) -> Iterable[Dict[str, Any]]:
        cfg = self.cfg
        train_s = Loader(self.datasets["train_s"], cfg.data.bs, seed=cfg.data.seed,
                         num_threads=cfg.data.num_workers)
        if cfg.method == "baseline":
            if cfg.data.train_with_t and not cfg.data.train_with_s:
                # supervised-target oracle (Trainer_baseline.py:221-227)
                train_t = Loader(self.datasets["train_t"], cfg.data.bs,
                                 seed=cfg.data.seed + 17,
                                 num_threads=cfg.data.num_workers)
                for batch in train_t:
                    yield {"img_t": batch[0], "lab_t": batch[1],
                           "names_t": batch[-1]}
                return
            for batch in train_s:
                yield {"img_s": batch[0], "lab_s": batch[1], "names_s": batch[-1]}
            return
        train_t = Loader(self.datasets["train_t"], cfg.data.bs,
                         seed=cfg.data.seed + 17, num_threads=cfg.data.num_workers)
        for batch in zip_domains(train_s, train_t,
                                 aug_counter=cfg.data.aug_counter):
            if cfg.method == "bcl":
                plabels = [self._bcl_plabels.get(
                    n, np.full(batch["img_t"].shape[1:3], 255, np.int32))
                    for n in batch["names_t"]]
                batch["plabel_t"] = np.stack(plabels)
            yield batch

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        if cfg.method == "bcl" and epoch % max(cfg.run.bcl_round_epochs, 1) == 0:
            self._bcl_update_plabels(cfg.run.bcl_prop)
        sched = self._sched(epoch)
        # RAIN epsilon loop: after warmup, each batch runs eps_iters
        # iterations with the sampling carried and updated (reference
        # Trainer_MCCL.py:189-192); fresh sampling only on the first
        eps_iters = 1
        if (cfg.rain.enabled and cfg.rain.update_eps
                and epoch >= cfg.contrastive.warmup_epochs):
            eps_iters = max(1, cfg.rain.eps_iters)
        sched_cont = dict(sched)
        sched_cont["fresh"] = jnp.asarray(0.0, jnp.float32)

        from ..data.loader import device_prefetch
        put = None
        put_stacked = None
        if getattr(self, "mesh", None) is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sp = (cfg.mesh.spatial and self.mesh.shape["model"] > 1)
            sp_n = self.mesh.shape["model"]

            # spatial (row) sharding applies only to image-shaped tensors —
            # img_*/lab_*/plabel_* batch keys. A generic ndim>=3 rule would
            # also capture e.g. AdaptEvery point-cloud verts (B, 300, 3),
            # forcing a resharding before the PointNet branches.
            def _is_spatial(k):
                return k.split("_")[0] in ("img", "lab", "plabel")

            def put(v, k=""):  # noqa: F811 — batch over 'data' (+rows over 'model')
                if sp and _is_spatial(k) and v.ndim >= 3 \
                        and v.shape[1] % sp_n == 0:
                    spec = P("data", "model", *([None] * (v.ndim - 2)))
                else:
                    spec = P("data", *([None] * (v.ndim - 1)))
                return jax.device_put(v, NamedSharding(self.mesh, spec))

            def put_stacked(v, k=""):  # (K, B, ...) — batch dim is axis 1
                if sp and _is_spatial(k) and v.ndim >= 4 \
                        and v.shape[2] % sp_n == 0:
                    spec = P(None, "data", "model",
                             *([None] * (v.ndim - 3)))
                else:
                    spec = P(None, "data", *([None] * (v.ndim - 2)))
                return jax.device_put(v, NamedSharding(self.mesh, spec))
        acc: Dict[str, Any] = {}
        n = 0
        batches = ({k: v for k, v in b.items() if isinstance(v, np.ndarray)}
                   for b in self._epoch_batches())

        K = max(1, int(cfg.run.scan_steps))
        if K > 1 and eps_iters == 1:
            # K steps per dispatch via lax.scan (steps.make_multi_step);
            # the epoch tail (<K leftover batches) runs the plain step below
            if getattr(self, "_multi_step", None) is None:
                from .steps import make_multi_step
                self._multi_step = make_multi_step(self.step_fn)
            tail: list = []

            def _stacked(it):
                buf = []
                for b in it:
                    buf.append(b)
                    if len(buf) == K:
                        yield {k: np.stack([bb[k] for bb in buf])
                               for k in buf[0]}
                        buf = []
                tail.extend(buf)

            for arrays in device_prefetch(_stacked(batches),
                                          size=cfg.data.prefetch,
                                          put=put_stacked):
                self.state, metrics = self._multi_step(self.state, arrays,
                                                       sched)
                for k, v in metrics.items():
                    acc[k] = acc.get(k, 0.0) + v * K  # scan returns the mean
                n += K
            batches = iter(tail)

        for arrays in device_prefetch(batches, size=cfg.data.prefetch, put=put):
            for it in range(eps_iters):
                s = sched if it == 0 else sched_cont
                self.state, metrics = self.step_fn(self.state, arrays, s)
                for k, v in metrics.items():
                    acc[k] = acc.get(k, 0.0) + v  # device-side accumulation
                n += 1
        return {k: float(v) / max(n, 1) for k, v in acc.items()}

    def eval(self, split: str = "valid_t", toprint: bool = False,
             ifhd: bool = True, ifasd: bool = True, fast: bool = False):
        loader = Loader(self.datasets[split], self.cfg.data.eval_bs,
                        shuffle=False, drop_last=False,
                        num_threads=self.cfg.data.num_workers)
        variables = {"params": self.state.seg.params}
        if self.state.seg.batch_stats:
            variables["batch_stats"] = self.state.seg.batch_stats
        if fast:
            return self.evaluator.evaluate_fast(variables, loader)
        return self.evaluator.evaluate_single_dataset(
            variables, loader, ifhd=ifhd, ifasd=ifasd, toprint=toprint)

    # ------------------------------------------------------------------
    def save_checkpoint(self, tag: str = "last"):
        import orbax.checkpoint as ocp
        self.out_dir.mkdir(parents=True, exist_ok=True)
        path = (self.out_dir / f"ckpt_{tag}").absolute()
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, self.state, force=True)
        ckptr.wait_until_finished()

    def restore_checkpoint(self, tag: str = "best", params_only: bool = False):
        """Restore the full TrainState; ``tag`` is a tag under out_dir or an
        absolute checkpoint path (reference -restore_from parity).

        ``params_only``: restore only the network weights/batch-stats leaves
        (for eval/serving) — optimizer state in the checkpoint is ignored,
        so the restoring process does not need to reconstruct the training
        optimizer (e.g. evaluate.py need not know the run used adam)."""
        import orbax.checkpoint as ocp
        p = Path(tag)
        path = p.absolute() if (p.is_absolute() or p.exists()) \
            else (self.out_dir / f"ckpt_{tag}").absolute()
        ckptr = ocp.StandardCheckpointer()
        if not params_only:
            self.state = ckptr.restore(path, self.state)
            return
        import jax as _jax
        # template-free restore returns the saved tree as nested dicts, so
        # the saved optimizer state never has to match this process's
        raw = ckptr.restore(path)

        def merge(fresh, saved, kept, dropped, at):
            """Overlay ``saved`` onto ``fresh`` (cross-method warm starts:
            e.g. an AdvEnt checkpoint into an MCCL model keeps the fresh
            phead the checkpoint cannot provide). Shape mismatches raise —
            a silently misloaded backbone invalidates the recipe."""
            if not isinstance(saved, dict) or not isinstance(fresh, dict):
                s = jnp.asarray(saved)
                if hasattr(fresh, "shape") and fresh.shape != s.shape:
                    raise ValueError(
                        f"checkpoint leaf {at} has shape {s.shape}, "
                        f"model expects {fresh.shape}")
                return s
            out = {}
            for k, v in fresh.items():
                if k in saved:
                    out[k] = merge(v, saved[k], kept, dropped, f"{at}/{k}")
                else:
                    out[k] = v
                    kept.append(f"{at}/{k}")
            dropped.extend(f"{at}/{k}" for k in saved if k not in fresh)
            return out

        kept, dropped = [], []
        nets = {}
        for name in ("seg", "d_main", "d_aux"):
            net = getattr(self.state, name)
            sub = raw.get(name) if isinstance(raw, dict) else None
            if net is None or sub is None:
                continue
            bs = sub.get("batch_stats")
            nets[name] = net.replace(
                params=merge(net.params, sub["params"], kept, dropped, name),
                batch_stats=(merge(net.batch_stats, bs, kept, dropped,
                                   f"{name}.bs")
                             if bs else net.batch_stats))
        if kept:
            print(f"warm start: kept fresh init for {len(kept)} subtree(s) "
                  f"absent from the checkpoint: {', '.join(kept[:8])}"
                  + (" ..." if len(kept) > 8 else ""))
        if dropped:
            print(f"warm start: checkpoint subtree(s) without a model "
                  f"counterpart ignored: {', '.join(dropped[:8])}"
                  + (" ..." if len(dropped) > 8 else ""))
        # 'extra' nets (ddfseg d_seg, adaptevery d_ent/d_point, mccl rain)
        # so eval/predict of those checkpoints restores every network it
        # evaluates; non-NetState leaves (raw rain params) load verbatim
        raw_extra = raw.get("extra") if isinstance(raw, dict) else None
        if self.state.extra and raw_extra:
            extra = dict(self.state.extra)
            for name, net in extra.items():
                sub = raw_extra.get(name)
                if sub is None:
                    continue
                if hasattr(net, "replace") and isinstance(sub, dict) \
                        and "params" in sub:
                    extra[name] = net.replace(
                        params=_jax.tree.map(jnp.asarray, sub["params"]),
                        batch_stats=_jax.tree.map(
                            jnp.asarray, sub.get("batch_stats", {})))
                else:
                    extra[name] = _jax.tree.map(jnp.asarray, sub)
            nets["extra"] = extra
        if not nets:
            raise ValueError(f"no network subtrees found in checkpoint {path}")
        self.state = self.state.replace(**nets)

    # ------------------------------------------------------------------
    def stop_training(self, epoch: int, epoch_time: float, score: float) -> bool:
        """Wall-clock budget + dice-plateau early stop (Trainer.py:209-224)."""
        cfg = self.cfg
        self.longest_epoch = max(self.longest_epoch, epoch_time)
        elapsed = time.time() - self.start_time
        if elapsed + self.longest_epoch + 30 * 60 > cfg.run.max_duration_s:
            return True
        if cfg.run.early_stop_patience and self.best_epoch >= 0:
            if epoch - self.best_epoch >= cfg.run.early_stop_patience:
                return True
        return False

    def train(self) -> Dict[str, Any]:
        cfg = self.cfg
        self.out_dir.mkdir(parents=True, exist_ok=True)
        log_path = self.out_dir / "log.jsonl"
        from ..utils.callbacks import EarlyStopCallback, ModelCheckPointCallback
        from ..utils.tb import TBWriter
        tb = TBWriter(str(self.out_dir / "tb"))
        mcp = ModelCheckPointCallback(
            str(self.out_dir), self.save_checkpoint, mode="max",
            save_every_epochs=cfg.run.save_every_epochs,
            n_epochs=cfg.optim.epochs, apdx=self.apdx[:60])
        early = EarlyStopCallback(cfg.run.early_stop_patience, mode="max")
        if cfg.run.init_from:
            # warm start (params only, cross-method): the reference SLCL
            # protocol's pretrained-segmentor init (Trainer_MPSCL.py:306-331
            # pairs it with the class-center file). Raises on failure — a
            # silent fall-through to random weights invalidates the recipe
            # (same hazard class as the missing-RAIN-ckpt bug, README).
            self.restore_checkpoint(cfg.run.init_from, params_only=True)
            print(f"warm-started networks from '{cfg.run.init_from}'")
            if cfg.method != "pretrain_rain":
                # pre-training eval of the warm start ("epoch -1"): seeds
                # the best-checkpoint selection so a fine-tune that never
                # beats its init still ships the init, and gives the run
                # log an explicit baseline for the continuation
                results = self.eval("valid_t", ifhd=False, ifasd=False,
                                    fast=cfg.run.fast_val)
                dice = mean_fg_dice(results)
                if mcp.step(dice, -1):
                    self.best_score = dice
                early.step(dice, -1)
                rec = {"epoch": -1, "val_dice": dice}
                self.history.append(rec)
                with open(log_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(f"[{self.apdx}] init val_dice={dice:.4f}")
        if cfg.run.restore_from:
            # resume: '-restore_from' parity (Trainer_baseline.py:144-162)
            try:
                self.restore_checkpoint(cfg.run.restore_from)
                print(f"resumed from checkpoint '{cfg.run.restore_from}'")
            except Exception as e:
                print(f"restore failed ({e}); training from scratch")
        profile_epoch = cfg.run.profile_epoch
        if cfg.run.profile_dir and profile_epoch >= cfg.optim.epochs:
            # a 1-epoch run with the default profile_epoch=1 would silently
            # produce no trace — clamp to the last epoch that actually runs
            profile_epoch = cfg.optim.epochs - 1
            print(f"run.profile_epoch clamped to {profile_epoch} "
                  f"(run has only {cfg.optim.epochs} epoch(s))")
        for epoch in range(cfg.optim.epochs):
            t0 = time.time()
            if cfg.run.profile_dir and epoch == profile_epoch:
                # one-epoch device trace (run.profile_dir); the TPU-native
                # replacement for the reference's print-only timers
                from ..utils.timer import profile_trace
                with profile_trace(cfg.run.profile_dir):
                    train_metrics = self.train_epoch(epoch)
            else:
                train_metrics = self.train_epoch(epoch)
            record: Dict[str, Any] = {"epoch": epoch, **train_metrics}
            if cfg.method == "pretrain_rain":
                # checkpoint on min combined loss (Pretrainer_RAIN.py:216-227)
                score = -sum(train_metrics.get(k, 0.0)
                             for k in ("loss_c", "loss_s", "loss_l", "loss_r"))
                record["score"] = score
                if mcp.step(score, epoch):
                    self.best_score = score
                    self.best_epoch = epoch
            elif (epoch + 1) % cfg.run.eval_frequency == 0 or epoch == cfg.optim.epochs - 1:
                # per-epoch validation is dice-only; surface metrics (HD95/
                # ASSD) run once at final test like the reference
                results = self.eval("valid_t", ifhd=False, ifasd=False,
                                    fast=cfg.run.fast_val)
                dice = mean_fg_dice(results)
                record["val_dice"] = dice
                if cfg.run.evalT and "test_t" in self.datasets:
                    # '-evalT' parity: also track test-set dice during
                    # training (reference Trainer.py:44; selection still
                    # uses val_dice)
                    tres = self.eval("test_t", ifhd=False, ifasd=False,
                                     fast=cfg.run.fast_val)
                    record["test_dice"] = mean_fg_dice(tres)
                if mcp.step(dice, epoch):
                    self.best_score = dice
                    self.best_epoch = epoch
                if early.step(dice, epoch):
                    record["early_stop"] = True
            epoch_time = time.time() - t0
            record["epoch_time_s"] = round(epoch_time, 3)
            self.history.append(record)
            if epoch == 5 and "dice_style_c1" in record:
                # the early window is complete: check the RAIN co-train for
                # the unlearnable-stylized-class collapse signature
                for w in stylized_branch_triggers(self.history):
                    print(f"[{self.apdx}] {w}")
            tb.scalars(record, epoch + 1)
            with open(log_path, "a") as f:
                f.write(json.dumps(record) + "\n")
            print(f"[{self.apdx}] " + " ".join(
                f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in record.items()))
            if record.get("early_stop") or self.stop_training(
                    epoch, epoch_time, record.get("val_dice", 0.0)):
                print("early stop / wall-clock budget reached")
                mcp.finalize()
                break
        self.save_checkpoint("last")
        if cfg.method == "pretrain_rain":
            # export the four component checkpoints in the format the RAIN
            # loaders consume (cfg.rain.*_ckpt) — the reference keeps one
            # .pt per net (Pretrainer_RAIN.py:68-111)
            from ..utils.torch_convert import save_tree_npz
            params = jax.tree.map(np.asarray, self.state.seg.params)
            for name in ("encoder", "decoder", "fc_encoder", "fc_decoder"):
                save_tree_npz(str(self.out_dir / f"rain_{name}.npz"),
                              params=params[name])
            summary = {"best_epoch": self.best_epoch,
                       "best_score": self.best_score, "history": self.history,
                       "component_ckpts": {
                           name: str(self.out_dir / f"rain_{name}.npz")
                           for name in ("encoder", "decoder",
                                        "fc_encoder", "fc_decoder")}}
            with open(self.out_dir / "summary.json", "w") as f:
                json.dump(summary, f, indent=2)
            return summary
        # final test with the best checkpoint: target AND source domains
        # (reference Trainer_MPSCL.py:434-453, Trainer_baseline.py:308-339),
        # plus the other MMWHS fold for the baseline's cross-fold table
        if mcp.wrote_best:
            # the best ckpt may be the epoch -1 warm-start eval (init_from)
            self.restore_checkpoint("best")
        elif (self.out_dir / "ckpt_best").exists():
            # ckpt_best on disk but THIS run never wrote one: stale leftover
            # from a previous run in the same deterministic out_dir —
            # restoring it would attribute old weights' test results to
            # this run. Test the last state instead.
            print("warning: ignoring stale ckpt_best not written by this "
                  "run; final test uses the last-state weights")
        test_results = self.eval("test_t", toprint=True)
        test_s_results = None
        if "test_s" in self.datasets:
            test_s_results = self.eval("test_s", toprint=True)
        test_other = None
        if cfg.method == "baseline" and cfg.data.dataset == "mmwhs":
            try:
                other = dataclasses_replace_fold(cfg)
                from .. import data as data_mod
                ds = data_mod.prepare_datasets(other)["test_t"]
                self.datasets["test_t_other_fold"] = ds
                test_other = self.eval("test_t_other_fold", toprint=True)
            except Exception as e:  # other fold's files may be absent
                print(f"other-fold eval skipped ({e})")
        summary = {"best_epoch": self.best_epoch, "best_val_dice": self.best_score,
                   "test": test_results, "test_s": test_s_results,
                   "test_t_other_fold": test_other, "history": self.history}
        with open(self.out_dir / "summary.json", "w") as f:
            json.dump(summary, f, indent=2)
        return summary
