"""Typed configuration tree + dataset fold tables.

Replaces the reference's three overlapping config mechanisms (constants module
``config.py``, layered argparse in the trainer tower, entry-script attribute
mutation — see reference trainer/Trainer.py:40-116 and train_SLCL.py:12-48)
with one dataclass tree supporting YAML + CLI ``key=value`` overrides.

The cross-validation fold tables are dataset facts reproduced from reference
config.py:39-119 (they are required for split-level parity with the paper).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple

# ---------------------------------------------------------------------------
# Dataset constants (reference config.py:3-37)
# ---------------------------------------------------------------------------
NUM_CLASSES = 4          # background, MYO, LV, RV
INPUT_SIZE = 224
BATCH_SIZE = 16
EVAL_BS = 32
RANDOM_SEED = 1234
POWER = 0.9              # poly LR exponent

# MMWHS label remap: raw NIfTI values -> class ids (reference utils_.py:1002-1020)
MMWHS_LABEL_MAP = {205: 1, 500: 2, 600: 3}
# MS-CMRSeg PNG mask remap (reference data_generator_mscmrseg.py:343-353)
MSCMRSEG_LABEL_MAP = {85: 1, 212: 2, 255: 3}
# MMWHS preprocessed-PNG mask remap (reference data_generator_mmwhs.py:93)
MMWHS_PNG_LABEL_MAP = {87: 1, 212: 2, 255: 3}

# ---------------------------------------------------------------------------
# Cross-validation fold tables (reference config.py:39-119)
# ---------------------------------------------------------------------------
MMWHS_TEST_FOLDS: List[List[List[int]]] = [
    # split 0
    [[1, 4, 6, 7, 8, 9, 10, 11, 16, 17], [2, 3, 5, 12, 13, 14, 15, 18, 19, 20]],
    # split 1
    [[1, 4, 6, 7, 8, 10, 14, 15, 18, 19], [2, 3, 5, 9, 11, 12, 13, 16, 17, 20]],
    # split 2
    [[1, 3, 8, 9, 10, 12, 15, 16, 17, 18], [2, 4, 5, 6, 7, 11, 13, 14, 19, 20]],
    # split 3
    [[1, 3, 5, 6, 7, 8, 9, 10, 12, 19], [2, 4, 11, 13, 14, 15, 16, 17, 18, 20]],
    # split 4
    [[2, 4, 6, 7, 8, 9, 10, 11, 15, 18], [1, 3, 5, 12, 13, 14, 16, 17, 19, 20]],
    # split 5
    [[1, 2, 4, 6, 7, 8, 11, 12, 16, 19], [3, 5, 9, 10, 13, 14, 15, 17, 18, 20]],
    # split 6
    [[2, 5, 6, 8, 9, 10, 13, 14, 15, 17], [1, 3, 4, 7, 11, 12, 16, 18, 19, 20]],
    # split 7
    [[1, 2, 3, 4, 6, 7, 12, 13, 14, 18], [5, 8, 9, 10, 11, 15, 16, 17, 19, 20]],
    # split 8
    [[2, 3, 5, 6, 10, 11, 12, 16, 18, 19], [1, 4, 7, 8, 9, 13, 14, 15, 17, 20]],
    # split 9
    [[3, 5, 7, 10, 12, 13, 14, 16, 17, 20], [1, 2, 4, 6, 8, 9, 11, 15, 18, 19]],
    # split 10
    [[1, 2, 3, 5, 9, 10, 14, 15, 17, 19], [4, 6, 7, 8, 11, 12, 13, 16, 18, 20]],
    # split 11
    [[1, 2, 3, 5, 8, 12, 13, 16, 17, 20], [4, 6, 7, 9, 10, 11, 14, 15, 18, 19]],
    # split 12
    [[2, 3, 4, 5, 8, 12, 13, 16, 17, 20], [1, 6, 7, 9, 10, 11, 14, 15, 18, 19]],
    # split 13 (without sample 1)
    [[2, 3, 4, 5, 8, 12, 13, 16, 17, 20], [6, 7, 9, 10, 11, 14, 15, 18, 19]],
    # split 14 (all patients in both folds)
    [list(range(1, 21)), list(range(1, 21))],
    # split 15: 3-fold
    [[5, 6, 8, 10, 11, 17, 18], [1, 9, 13, 14, 16, 19, 20], [2, 3, 4, 7, 12, 15]],
]

# Patient ID universes (reference config.py:112-116). CT patient files are
# offset by +32 in the raw directory layout.
MMWHS_CT_VALID_SET = list(range(1, 6))
MMWHS_CT_TRAIN_SET = list(range(1, 33))
MMWHS_MR_VALID_SET = [21, 22, 27, 30, 43]
MMWHS_MR_TRAIN_SET = list(range(21, 47))
MMWHS_CT_ID_OFFSET = 32

MSCMRSEG_TEST_FOLDS: List[List[int]] = [
    [23, 24, 29, 27, 34, 16, 25, 8, 22, 36, 35, 18, 30, 10, 39, 26, 41, 12, 38, 43],
    [6, 7, 9, 11, 13, 14, 15, 17, 19, 20, 21, 28, 31, 32, 33, 37, 40, 42, 44, 45],
]


# ---------------------------------------------------------------------------
# Config dataclasses
# ---------------------------------------------------------------------------
@dataclass
class DataConfig:
    """Data pipeline settings (reference DataGenerator ctor args)."""
    dataset: str = "mmwhs"            # mmwhs | mscmrseg | synthetic
    data_dir: str = ""
    raw: bool = True                  # raw per-slice NIfTI vs preprocessed PNG
    rev: bool = False                 # reverse source/target modality
    fold: int = 0
    split: int = 0
    val_num: Optional[int] = None     # target fold idx override (raw pipeline)
    crop: int = INPUT_SIZE
    normalization: str = "minmax"     # minmax | zscore
    percent: float = 99.0             # percentile window for minmax fallback
    aug_s: bool = True                # augment source
    aug_t: bool = True                # augment target
    # baseline supervised-domain selection (reference Trainer_baseline.py:34-37,
    # :221-227: train_with_s default-on trains on source labels; train_with_t
    # with train_with_s=false trains supervised on TARGET labels — the oracle
    # upper-bound configuration)
    train_with_s: bool = True
    train_with_t: bool = False
    aug_mode: str = "simple"          # simple | heavy | heavy2
    aug_counter: bool = False         # emit (img_t, img_t_aug) pairs (MCCL)
    vert: bool = False                # point-cloud vertices (AdaptEvery)
    gap: float = 1.0                  # synthetic CT->MR domain-gap strength
    bs: int = BATCH_SIZE
    eval_bs: int = EVAL_BS
    num_workers: int = 4
    prefetch: int = 2
    seed: int = RANDOM_SEED


@dataclass
class ModelConfig:
    backbone: str = "drunet"          # drunet | unet | deeplabv2 | resnet50_unet
    filters: int = 32
    n_block: int = 4
    bottleneck_depth: int = 4
    in_channels: int = 3
    num_classes: int = NUM_CLASSES
    multilvl: bool = False            # auxiliary classifier head
    layers: Tuple[int, ...] = ()      # ResNet stage depths override (tests)
    base: int = 64                    # ResNet/discriminator/PointNet width
    #                                   knob; 64 = reference-exact (CI/dryrun)
    phead: bool = False               # projection head on decoder features
    pretrained: bool = False          # load ImageNet encoder weights
    # torch .pth (torchvision ResNet naming) or converted .npz produced by
    # scripts/convert_torch.py; consumed when pretrained=True
    pretrained_ckpt: str = ""
    dtype: str = "bfloat16"           # activation dtype on TPU
    # rematerialize the segmentor forward: false/"" = off; true/"full" =
    # plain jax.checkpoint (trade FLOPs for HBM at large batch); "dots" =
    # checkpoint_dots policy (keep matmul results, recompute elementwise)
    remat: str = ""


@dataclass
class OptimConfig:
    optimizer: str = "sgd"            # sgd | adam
    lr: float = 8e-4
    lr_dis: float = 1e-4              # discriminator LR (Adam betas adv.mmt1/adv.mmt)
    # decay lr_dis with the same schedule as the generator; the reference
    # default keeps D LR constant (Trainer_AdaptSeg.py:119-127 gates on
    # -adjust_lr_dis)
    adjust_lr_dis: bool = False
    lr_decay_method: Optional[str] = "poly"   # poly | linear | None
    lr_decay: float = 2e-3            # 'linear' inverse-time decay factor
                                      # (reference LEARNING_RATE_DECAY)
    lr_end: float = 0.0
    momentum: float = 0.9
    weight_decay: float = 5e-4
    power: float = POWER
    epochs: int = 200
    lr_eps: float = 1.0               # RAIN epsilon-ascent step scale
    # linear LR warmup over the first N epochs (scale (e+1)/N, full LR from
    # epoch N-1). No reference equivalent — added for run.init_from
    # fine-tunes: a fresh Adam restart takes near-full-size first steps
    # (zeroed second moments) and can kick a converged warm start out of
    # its basin (measured: AdvEnt-init MPSCL seeds 13/99, examples/README.md)
    lr_warmup_epochs: int = 0


@dataclass
class AdversarialConfig:
    """AdaptSeg/AdvEnt discriminator branch (reference Trainer_AdaptSeg/Advent)."""
    w_dis: float = 1e-3
    w_dis_aux: float = 2e-4
    w_seg_aux: float = 0.1            # aux-head seg loss weight (Trainer_AdaptSeg.py:26-27)
    mmt1: float = 0.9                 # discriminator Adam beta1 (Trainer_AdaptSeg.py:31)
    mmt: float = 0.99                 # discriminator Adam beta2 (Trainer_AdaptSeg.py:32)
    # AdaptEvery extras (Trainer_AdaptEvery.py:29-31, :242, :293)
    wp: float = 1.0                   # Chamfer point-cloud loss weight
    w_d_ent: float = 1e-3             # entropy-map discriminator weight
    w_d_point: float = 1e-3           # PointNet discriminator weight
    w_ent: float = 0.0                # direct entropy minimisation weight
    w_prior: float = 0.0              # class-prior hinge weight
    class_prior: Tuple[float, ...] = (0.9146, 0.0253, 0.0309, 0.0292)
    prior_slack: float = 1.0


@dataclass
class ContrastiveConfig:
    """SLCL/MPSCL/MCCL contrastive settings (reference Trainer_MPSCL.py:28-55,
    Trainer_MCCL.py:36-87, train_SLCL.py:6-48, train_MCCL.py:35-48)."""
    # MPSCL (margin-preserving)
    src_temp: float = 0.1
    src_base_temp: float = 1.0
    trg_temp: float = 0.1
    trg_base_temp: float = 1.0
    src_margin: float = 0.4
    trg_margin: float = 0.2
    class_center_m: float = 0.9       # EMA momentum of source class centers
    pixel_sel_th: float = 0.25        # top1-top2 cosine gap threshold
    w_mpcl_s: float = 1.0
    w_mpcl_t: float = 1.0
    easy_margin: bool = False
    init_centers: str = ""            # path to (C, F) .npy init class centers
    # MCCL / SLCL-proper
    clda: bool = True                 # enable centroid contrastive loss
    # contrastive temperature: recorded in the run fingerprint for parity,
    # but the reference's EXECUTED vectorized ContrastiveLoss applies no
    # temperature (loss.py:264-275; the tau-using loop is commented out) —
    # we reproduce that; pass tau= to ops.losses.centroid_contrastive_loss
    # directly for the legacy loop semantics
    tau: float = 0.1
    ctd_mmt: float = 0.9              # centroid EMA momentum
    inter_w: float = 1.0
    intra: bool = True
    intra_w: float = 0.1
    part: int = 1                     # reversed-Monte-Carlo partitions P
    wtd_ave: bool = False             # soft-label weighted centroids
    thd: float = 0.0                  # confidence threshold for soft centroids
    contrast_split: bool = False
    bg: bool = False                  # include background row in contrastive
    # Reference-exact MCCL runs ONE forward over concat([style, src, trg,
    # trg_aug]) (Trainer_MCCL.py:217/:246), which couples BatchNorm batch
    # statistics across domains. Measured on the synthetic benchmark this
    # coupling alone costs 2.3x target dice during pure source training
    # (examples/README.md, runs e2 vs e3), so the default here is two
    # domain-pure forwards ([style, src] then [trg, trg_aug]); set
    # concat_forward=true for the reference-exact computation.
    concat_forward: bool = False
    CNR: bool = False                 # centroid-norm regulariser
    CNR_w: float = 4e-5
    stdmin: bool = False
    w_stdmin: float = 0.0
    seg_pseudo: bool = False
    # NOTE: the reference default is WARMUP_EPOCHS = EPOCHS (config.py:26)
    # — contrastive terms stay off unless -warmup_epochs is passed. Here 0
    # engages them immediately; set explicitly per recipe (early contrastive
    # on immature pseudo-labels hurts — see examples/README.md).
    warmup_epochs: int = 0


@dataclass
class RAINConfig:
    """RAIN style-randomisation settings (reference model/RAIN.py, Trainer_RAIN)."""
    enabled: bool = False
    update_eps: bool = False
    eps_iters: int = 5
    # cap on the per-iteration epsilon-ascent step L2 norm; the reference's
    # (lr_eps / samp_loss) scale is unbounded and blows up once the stylized
    # seg loss gets small (Trainer_RAIN.py:133-147) — 0 keeps that exact
    # behavior, >0 clamps (see examples/README.md, RAIN+eps diagnosis)
    eps_clip: float = 0.0
    # stylization strength: img_style <- alpha*stylized + (1-alpha)*content.
    # 1.0 is reference-exact (full AdaIN restyling). 0.5 is the validated
    # repair when the co-train shows the unlearnable-stylized-class
    # signature (trainer warns at epoch 5; s13 paired arm: 0.410 -> 0.727,
    # examples/README.md 'Round-5 root cause') — softens the style shift
    # w/o removing the augmentation.
    style_alpha: float = 1.0
    consist_w: float = 2e-3
    mulstyle: bool = False
    mulstyle2: bool = False
    vgg_ckpt: str = ""
    decoder_ckpt: str = ""
    fc_encoder_ckpt: str = ""
    fc_decoder_ckpt: str = ""
    # pretraining loss weights (reference Pretrainer_RAIN)
    style_weight: float = 1.0
    content_weight: float = 1.0
    latent_weight: float = 1.0
    recon_weight: float = 5.0


@dataclass
class DDFSegConfig:
    """DDFSeg loss weights (reference Trainer_DDFSeg.py:29-35 defaults) and
    network sizing (reference DDFSeg.py module defaults)."""
    filters: int = 16                 # content-encoder width (DDFSeg.py:92)
    style_filters: int = 8            # style-encoder width (DDFSeg.py:212)
    ngf: int = 32                     # decoder/seg-head width (DDFSeg.py:6)
    # collapse repeated identity-shape res stacks to 1 block each — a
    # compile-budget lever for CI / the multichip dryrun only
    slim: bool = False
    w_adv_t: float = 1.0
    w_adv_s: float = 1.0
    w_cyc: float = 1.0
    w_adv_aux: float = 0.1
    w_zero: float = 0.01
    w_seg: float = 0.1
    w_adv_seg: float = 0.1


@dataclass
class MeshConfig:
    """Device-mesh / parallelism settings (TPU-native; reference has none).

    The mesh is Mesh(('data','model')) with data-axis size =
    n_devices / model_axis."""
    model_axis: int = 1
    fsdp: bool = False                # shard params/opt over 'model' axis
    fsdp_min_size: int = 2 ** 16      # leaves smaller than this stay replicated
    spatial: bool = False             # shard image rows over 'model' axis
                                      # (GSPMD halo exchange; needs
                                      # model_axis > 1 and H % model_axis == 0)


@dataclass
class RunConfig:
    """Training-run orchestration (checkpoints, eval cadence, wall clock)."""
    out_dir: str = "runs"
    apdx: str = ""                    # run-name fingerprint; auto-built if empty
    seed: int = RANDOM_SEED
    eval_frequency: int = 10
    evalT: bool = False               # also evaluate test split each epoch
    save_every_epochs: int = 50
    early_stop_patience: int = 0      # 0 = disabled
    max_duration_s: float = 24 * 3600 - 300  # reference Trainer.py:23
    restore_from: str = ""
    # warm-start: load network weights/batch-stats (params only — no
    # optimizer state, step counter, or centroids) from a checkpoint before
    # training. This is the reference SLCL protocol's pretrained-segmentor
    # init (Trainer_MPSCL loads a source-trained model + its matching
    # class-center file; see contrastive.init_centers). Unlike restore_from
    # (a full resume that must match the training tree), init_from accepts
    # cross-method checkpoints (e.g. baseline -> mpscl) and raises on
    # failure instead of silently training from scratch.
    init_from: str = ""
    klc: bool = True                  # keep-largest-connected-component postproc
    # per-epoch validation entirely on device (dice only, no KLC): one
    # readback per epoch instead of label-map pulls; the final test always
    # uses the full host path with KLC + surface metrics
    fast_val: bool = False
    # TPU profiling: when set, wrap one training epoch (profile_epoch) in a
    # jax.profiler trace written under this directory (view with
    # tensorboard-plugin-profile / xprof). Replaces the reference's
    # wall-clock-only @timer.timeit decoration (utils/timer.py:4-19) with a
    # real device trace; defaults to epoch 1 so the epoch-0 compile doesn't
    # dominate the trace.
    profile_dir: str = ""
    profile_epoch: int = 1
    # >1: run K train steps per dispatch via lax.scan over K stacked batches
    # (steps.make_multi_step) — amortizes host->device dispatch, the dominant
    # per-step overhead on tunneled TPUs. Leftover (<K) batches at epoch end
    # run through the plain step. Ignored when the RAIN eps loop is active
    # (eps_iters>1 alternates sched between iterations).
    scan_steps: int = 1
    # BCL self-training rounds (reference Trainer_BCL: per-round pseudo-label
    # regeneration with class-balanced thresholds, LR halved per round)
    bcl_round_epochs: int = 10
    bcl_prop: float = 0.5
    bcl_lambt: float = 0.3            # target-loss weight (Trainer_BCL.py:46)
    bcl_lamb: float = 0.4             # entropy-loss weight (Trainer_BCL.py:47)


@dataclass
class Config:
    method: str = "baseline"  # baseline|adaptseg|advent|mpscl|mccl|slcl|rain|
                              # adaptevery|ddfseg|bcl|pretrain_rain
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    adv: AdversarialConfig = field(default_factory=AdversarialConfig)
    contrastive: ContrastiveConfig = field(default_factory=ContrastiveConfig)
    rain: RAINConfig = field(default_factory=RAINConfig)
    ddfseg: DDFSegConfig = field(default_factory=DDFSegConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    run: RunConfig = field(default_factory=RunConfig)

    # ------------------------------------------------------------------
    def replace(self, **updates: Any) -> "Config":
        return dataclasses.replace(self, **updates)

    def override(self, dotted: str, value: Any) -> None:
        """Set ``a.b.c = value`` in place, with string->field-type coercion."""
        parts = dotted.split(".")
        obj: Any = self
        for p in parts[:-1]:
            obj = getattr(obj, p)
        name = parts[-1]
        if not hasattr(obj, name):
            raise KeyError(f"unknown config key: {dotted}")
        cur = getattr(obj, name)
        setattr(obj, name, _coerce(value, cur))

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        cfg = cls()
        for section, payload in d.items():
            if isinstance(payload, dict):
                sub = getattr(cfg, section)
                for k, v in payload.items():
                    setattr(sub, k, _coerce(v, getattr(sub, k)))
            else:
                setattr(cfg, section, payload)
        return cfg

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        import yaml
        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f) or {})

    @classmethod
    def from_cli(cls, argv: Sequence[str], base: Optional["Config"] = None) -> "Config":
        """Parse ``--config file.yaml`` plus ``section.key=value`` overrides."""
        cfg = base if base is not None else cls()
        args = list(argv)
        if "--config" in args:
            i = args.index("--config")
            cfg = cls.from_yaml(args[i + 1])
            del args[i:i + 2]
        for a in args:
            if "=" not in a:
                raise ValueError(f"expected key=value override, got {a!r}")
            k, v = a.split("=", 1)
            cfg.override(k.lstrip("-"), v)
        return cfg


def _coerce(value: Any, current: Any) -> Any:
    if isinstance(value, str):
        if isinstance(current, (tuple, list)):
            body = value.strip().strip("()[]")
            if not body:
                return type(current)()
            items = [p.strip() for p in body.split(",") if p.strip()]
            def conv(s):
                try:
                    return int(s)
                except ValueError:
                    try:
                        return float(s)
                    except ValueError:
                        return s
            return type(current)(conv(p) for p in items)
        if isinstance(current, bool):
            return value.lower() in ("1", "true", "yes", "on")
        if isinstance(current, int) and not isinstance(current, bool):
            return int(value)
        if isinstance(current, float):
            return float(value)
        if current is None:
            try:
                return int(value)
            except ValueError:
                try:
                    return float(value)
                except ValueError:
                    return value
    return value


def build_apdx(cfg: Config) -> str:
    """Run-name fingerprint encoding the hyperparameters, mirroring the
    reference's load-bearing ``apdx`` system (reference Trainer.py:160-182)."""
    if cfg.run.apdx:
        return cfg.run.apdx
    c = cfg.contrastive
    parts = [
        cfg.method, cfg.data.dataset,
        f"f{cfg.data.fold}s{cfg.data.split}",
        cfg.model.backbone,
        f"bs{cfg.data.bs}", f"lr{cfg.optim.lr:g}",
    ]
    if cfg.method in ("mpscl", "slcl"):
        parts += [f"st{c.src_temp:g}m{c.src_margin:g}",
                  f"tt{c.trg_temp:g}m{c.trg_margin:g}", f"ccm{c.class_center_m:g}"]
    if cfg.method in ("mccl", "slcl"):
        parts += [f"tau{c.tau:g}", f"p{c.part}", f"mmt{c.ctd_mmt:g}",
                  f"inter{c.inter_w:g}"]
        if c.wtd_ave:
            parts.append("soft")
        if c.CNR:
            parts.append(f"cnr{c.CNR_w:g}")
    if cfg.model.multilvl:
        parts.append("mlvl")
    if cfg.model.phead:
        parts.append("ph")
    return ".".join(parts)


def apply_recipe(cfg: "Config") -> "Config":
    """Per-method hyperparameter presets mirroring the reference entry
    scripts (train_SLCL.py:6-48, train_MCCL.py:35-48, train_baseline.py:27-42).

    Every CLI entry (train/evaluate/predict/gen_class_centers) must apply
    this BEFORE constructing models: presets like mccl's ``model.phead``
    change the parameter-tree structure, and a mismatch breaks checkpoint
    restore (an eval harness that forgot this silently evaluated initial
    weights — now shared here so it cannot drift).
    """
    m = cfg.method
    if m == "slcl":
        # train_SLCL.py: fold 0, epochs 300, resnet50/multilvl in the paper
        # repo; DRUNet is the native backbone with the matching (4,32)
        # center files.
        cfg.contrastive.src_temp = 0.1
        cfg.contrastive.trg_temp = 0.1
        cfg.contrastive.src_margin = 0.4
        cfg.contrastive.trg_margin = 0.2
        cfg.contrastive.class_center_m = 0.9
        cfg.contrastive.CNR = True
        cfg.contrastive.CNR_w = 4e-5
        cfg.contrastive.part = 2
        cfg.optim.lr = 8e-4
    elif m == "rain":
        cfg.rain.enabled = True
    elif m == "adaptevery":
        cfg.data.vert = True
        cfg.model.multilvl = True
        cfg.model.backbone = "resnet50"
    elif m == "ddfseg":
        cfg.optim.optimizer = "adam"
        cfg.optim.lr = 2e-4
        cfg.optim.lr_dis = 2e-4
    elif m == "mccl":
        cfg.contrastive.clda = True
        cfg.contrastive.wtd_ave = True
        cfg.contrastive.part = 2
        cfg.contrastive.inter_w = 1.0
        cfg.contrastive.CNR = True
        cfg.contrastive.CNR_w = 4e-5
        cfg.contrastive.tau = 0.1
        cfg.contrastive.ctd_mmt = 0.9
        cfg.model.phead = True
        cfg.optim.lr = 8e-4
        cfg.data.aug_counter = True
    return cfg
