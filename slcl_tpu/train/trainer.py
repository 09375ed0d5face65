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


class Trainer:
    def __init__(self, cfg: Config, datasets: Optional[Dict[str, Any]] = None):
        """``datasets``: dict with keys 'train_s', 'train_t', 'valid_t',
        'test_t' (dataset objects with __len__/__getitem__). When None, the
        synthetic dataset is used (cfg.data.dataset == 'synthetic')."""
        self.cfg = cfg
        self.apdx = build_apdx(cfg)
        self.out_dir = Path(cfg.run.out_dir) / self.apdx
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.datasets = datasets or self._default_datasets()
        self._build()
        self.history: list = []
        self.best_score = -np.inf
        self.best_epoch = -1
        self.start_time = time.time()
        self.longest_epoch = 0.0

    # ------------------------------------------------------------------
    def _default_datasets(self):
        cfg = self.cfg
        if cfg.data.dataset == "synthetic":
            from ..data.synthetic import SyntheticCardiacDataset as S
            n = 8 * cfg.data.bs
            return {
                "train_s": S(n, cfg.data.crop, "ct", cfg.data.seed, augmentation=cfg.data.aug_s),
                "train_t": S(n, cfg.data.crop, "mr", cfg.data.seed + 1,
                             augmentation=cfg.data.aug_t,
                             aug_counter=cfg.data.aug_counter),
                "valid_t": S(2 * cfg.data.eval_bs, cfg.data.crop, "mr", cfg.data.seed + 2),
                "test_t": S(2 * cfg.data.eval_bs, cfg.data.crop, "mr", cfg.data.seed + 3),
            }
        from .. import data as data_mod
        return data_mod.prepare_datasets(cfg)

    def _build(self):
        cfg = self.cfg
        self.model = build_segmentor(cfg.model)
        disc = disc_aux = None
        if cfg.method in _ADVERSARIAL:
            disc = UncertaintyDiscriminator()
            if cfg.model.multilvl:
                disc_aux = UncertaintyDiscriminator()
        self.disc, self.disc_aux = disc, disc_aux

        centroids = None
        if cfg.method in ("mpscl", "slcl"):
            if cfg.contrastive.init_centers and os.path.exists(cfg.contrastive.init_centers):
                centroids = jnp.asarray(np.load(cfg.contrastive.init_centers),
                                        jnp.float32)
            else:
                # documented fallback: zero-init centers, warmed by the first
                # EMA updates (reference loads class_center_{mod}_f{fold}.npy,
                # Trainer_MPSCL.py:306-331)
                centroids = jnp.zeros((cfg.model.num_classes, cfg.model.filters),
                                      jnp.float32)

        sample_shape = (1, cfg.data.crop, cfg.data.crop, cfg.model.in_channels)
        self.state, self.txs = create_train_state(
            cfg, self.model, disc=disc, disc_aux=disc_aux,
            sample_shape=sample_shape, centroids=centroids)
        self.step_fn = build_step(cfg, self.model, self.txs, disc, disc_aux)
        self.evaluator = Evaluator(self.model, eval_bs=cfg.data.eval_bs,
                                   klc=cfg.run.klc,
                                   num_classes=cfg.model.num_classes)

    # ------------------------------------------------------------------
    def _sched(self, epoch: int) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        lr = schedules.get_lr(cfg.optim.lr_decay_method, cfg.optim.lr, epoch,
                              cfg.optim.epochs, cfg.optim.power, cfg.optim.lr_end)
        lr_dis = schedules.get_lr(cfg.optim.lr_decay_method, cfg.optim.lr_dis,
                                  epoch, cfg.optim.epochs, cfg.optim.power)
        warm = 1.0 if epoch >= cfg.contrastive.warmup_epochs else 0.0
        return {"lr": jnp.asarray(lr, jnp.float32),
                "lr_dis": jnp.asarray(lr_dis, jnp.float32),
                "warm": jnp.asarray(warm, jnp.float32)}

    def _epoch_batches(self) -> Iterable[Dict[str, Any]]:
        cfg = self.cfg
        train_s = Loader(self.datasets["train_s"], cfg.data.bs, seed=cfg.data.seed,
                         num_threads=cfg.data.num_workers)
        if cfg.method == "baseline":
            for img, lab, names in train_s:
                yield {"img_s": img, "lab_s": lab, "names_s": names}
            return
        train_t = Loader(self.datasets["train_t"], cfg.data.bs,
                         seed=cfg.data.seed + 17, num_threads=cfg.data.num_workers)
        yield from zip_domains(train_s, train_t,
                               aug_counter=cfg.data.aug_counter)

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        sched = self._sched(epoch)
        acc: Dict[str, Any] = {}
        n = 0
        for batch in self._epoch_batches():
            arrays = {k: jnp.asarray(v) for k, v in batch.items()
                      if isinstance(v, np.ndarray)}
            self.state, metrics = self.step_fn(self.state, arrays, sched)
            for k, v in metrics.items():
                acc[k] = acc.get(k, 0.0) + v  # device-side accumulation
            n += 1
        return {k: float(v) / max(n, 1) for k, v in acc.items()}

    def eval(self, split: str = "valid_t", toprint: bool = False,
             ifhd: bool = True, ifasd: bool = True):
        loader = Loader(self.datasets[split], self.cfg.data.eval_bs,
                        shuffle=False, drop_last=False,
                        num_threads=self.cfg.data.num_workers)
        variables = {"params": self.state.seg.params}
        if self.state.seg.batch_stats:
            variables["batch_stats"] = self.state.seg.batch_stats
        return self.evaluator.evaluate_single_dataset(
            variables, loader, ifhd=ifhd, ifasd=ifasd, toprint=toprint)

    # ------------------------------------------------------------------
    def save_checkpoint(self, tag: str = "last"):
        import orbax.checkpoint as ocp
        path = (self.out_dir / f"ckpt_{tag}").absolute()
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, self.state, force=True)
        ckptr.wait_until_finished()

    def restore_checkpoint(self, tag: str = "best"):
        import orbax.checkpoint as ocp
        path = (self.out_dir / f"ckpt_{tag}").absolute()
        ckptr = ocp.StandardCheckpointer()
        self.state = ckptr.restore(path, self.state)

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
        log_path = self.out_dir / "log.jsonl"
        for epoch in range(cfg.optim.epochs):
            t0 = time.time()
            train_metrics = self.train_epoch(epoch)
            record: Dict[str, Any] = {"epoch": epoch, **train_metrics}
            if (epoch + 1) % cfg.run.eval_frequency == 0 or epoch == cfg.optim.epochs - 1:
                # per-epoch validation is dice-only; surface metrics (HD95/
                # ASSD) run once at final test like the reference
                results = self.eval("valid_t", ifhd=False, ifasd=False)
                dice = mean_fg_dice(results)
                record["val_dice"] = dice
                if dice > self.best_score:
                    self.best_score = dice
                    self.best_epoch = epoch
                    self.save_checkpoint("best")
            epoch_time = time.time() - t0
            record["epoch_time_s"] = round(epoch_time, 3)
            self.history.append(record)
            with open(log_path, "a") as f:
                f.write(json.dumps(record) + "\n")
            print(f"[{self.apdx}] " + " ".join(
                f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in record.items()))
            if self.stop_training(epoch, epoch_time,
                                  record.get("val_dice", 0.0)):
                print("early stop / wall-clock budget reached")
                break
        self.save_checkpoint("last")
        # final test with the best checkpoint (reference final eval,
        # Trainer_MPSCL.py:434-453)
        if self.best_epoch >= 0:
            self.restore_checkpoint("best")
        test_results = self.eval("test_t", toprint=True)
        summary = {"best_epoch": self.best_epoch, "best_val_dice": self.best_score,
                   "test": test_results, "history": self.history}
        with open(self.out_dir / "summary.json", "w") as f:
            json.dump(summary, f, indent=2)
        return summary
