"""Evaluator: per-epoch validation + final test metrics.

Parity with reference evaluator.py:72-230 with the documented repair
(SURVEY §2.7): the reference imports medpy's *scalar* ``dc`` but indexes it
like a per-class sequence (evaluator.py:163-165); the intended behaviour —
per-foreground-class Dice as in metric.py:39-70 — is implemented here.

Forward passes are batched and jitted on device (argmax on device, one host
pull per batch); keep-largest-connected-component and the surface metrics
(HD95/ASSD) run on host, off the training loop's critical path.

Returns ``{'dc': [m1, s1, m2, s2, m3, s3], 'hd': ..., 'asd': ...}`` —
mean/std interleaved per foreground class (MYO, LV, RV), matching the
reference's aggregation (evaluator.py:191-216) that trainers consume with
their per-method conventions (SURVEY §2.7 note).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import metrics as M


def evaluate_arrays(
    preds: np.ndarray,
    gts: np.ndarray,
    *,
    ifhd: bool = True,
    ifasd: bool = True,
    klc: bool = True,
    num_classes: int = 4,
    ifhd95: bool = True,
    spacing=None,
    num_threads: int = 8,
) -> Dict[str, list]:
    """Aggregate per-slice per-class metrics over stacked label maps.

    The surface metrics (scipy EDT) dominate final-test wall time on large
    folds; slices are processed in a thread pool (ndimage releases the GIL)."""
    class_ids = tuple(range(1, num_classes))
    per_class = {c: {"dc": [], "hd": [], "asd": []} for c in class_ids}

    def one(args):
        pred, gt = args
        if klc:
            pred = M.keep_largest_connected_components(pred, class_ids)
        return M.metrics_per_class(gt, pred, apply_hd=ifhd, apply_asd=ifasd,
                                   class_ids=class_ids, ifhd95=ifhd95,
                                   spacing=spacing)

    if num_threads > 1 and len(preds) > 4 and (ifhd or ifasd):
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(num_threads) as pool:
            all_res = list(pool.map(one, zip(preds, gts)))
    else:
        all_res = [one(pg) for pg in zip(preds, gts)]
    for res in all_res:
        for c in class_ids:
            d, h, a = res[c]
            per_class[c]["dc"].append(d)
            per_class[c]["hd"].append(h)
            per_class[c]["asd"].append(a)
    out = {"dc": [], "hd": [], "asd": []}
    for c in class_ids:
        for k in ("dc", "hd", "asd"):
            vals = np.asarray(per_class[c][k], np.float64)
            out[k].extend([float(np.mean(vals)), float(np.std(vals))])
    return out


class Evaluator:
    """Batched on-device inference + host metric aggregation."""

    def __init__(self, model, *, eval_bs: int = 32, klc: bool = True,
                 num_classes: int = 4, pred_index: int = 0):
        self.model = model
        self.eval_bs = eval_bs
        self.klc = klc
        self.num_classes = num_classes
        self.pred_index = pred_index
        self._infer = None

    def _build_infer(self):
        model = self.model

        @jax.jit
        def infer(variables, x):
            out = model.apply(variables, x, False)
            pred = out.pred if self.pred_index == 0 else out.aux
            return jnp.argmax(pred.astype(jnp.float32), axis=-1)

        return infer

    def predict(self, variables, loader) -> tuple:
        """Run inference over a loader of (img, mask, name) batches, with
        host->device transfer of batch i+1 pipelined behind batch i's step
        and the device->host readback deferred to the end."""
        if self._infer is None:
            self._infer = self._build_infer()
        preds, gts = [], []
        pending = None
        for img, mask, _names in loader:
            dev_img = jax.device_put(img)
            if pending is not None:
                preds.append(pending)  # device array; readback deferred
            pending = self._infer(variables, dev_img)
            gts.append(np.asarray(mask))
        if pending is not None:
            preds.append(pending)
        preds = [np.asarray(p) for p in preds]
        return np.concatenate(preds), np.concatenate(gts)

    def _build_dice(self):
        model = self.model
        C = self.num_classes

        @jax.jit
        def dice_batch(variables, x, gt):
            out = model.apply(variables, x, False)
            logits = out.pred if self.pred_index == 0 else out.aux
            pred = jnp.argmax(logits.astype(jnp.float32), axis=-1)
            p1 = jax.nn.one_hot(pred.reshape(pred.shape[0], -1), C,
                                dtype=jnp.float32)
            g1 = jax.nn.one_hot(gt.reshape(gt.shape[0], -1), C,
                                dtype=jnp.float32)
            inter = jnp.sum(p1 * g1, axis=1)                 # (B, C)
            denom = jnp.sum(p1, axis=1) + jnp.sum(g1, axis=1)
            return jnp.where(denom > 0, 2.0 * inter / denom, 0.0)

        return dice_batch

    def evaluate_fast(self, variables, loader) -> Dict[str, list]:
        """Dice-only validation computed entirely on device: one scalar-array
        readback per epoch instead of a full label-map pull + host loop
        (PERF.md 'on-device dice' headroom item). No KLC postprocessing —
        use only for per-epoch checkpoint selection, never the final table."""
        if not hasattr(self, "_dice") or self._dice is None:
            self._dice = self._build_dice()
        chunks = []
        for img, mask, _names in loader:
            chunks.append(self._dice(variables, jax.device_put(img),
                                     jax.device_put(mask.astype(np.int32))))
        all_dice = np.concatenate([np.asarray(c) for c in chunks])  # (N, C)
        out = {"dc": [], "hd": [], "asd": []}
        for c in range(1, self.num_classes):
            vals = all_dice[:, c]
            out["dc"].extend([float(vals.mean()), float(vals.std())])
            out["hd"].extend([0.0, 0.0])
            out["asd"].extend([0.0, 0.0])
        return out

    def evaluate_single_dataset(self, variables, loader, *, ifhd=True,
                                ifasd=True, toprint=False) -> Dict[str, list]:
        preds, gts = self.predict(variables, loader)
        results = evaluate_arrays(preds, gts, ifhd=ifhd, ifasd=ifasd,
                                  klc=self.klc, num_classes=self.num_classes)
        if toprint:
            names = ["myo", "lv", "rv"][: self.num_classes - 1]
            for i, n in enumerate(names):
                print(f"{n}: dc {results['dc'][2 * i]:.4f}({results['dc'][2 * i + 1]:.4f}) "
                      f"hd {results['hd'][2 * i]:.3f}({results['hd'][2 * i + 1]:.3f}) "
                      f"asd {results['asd'][2 * i]:.3f}({results['asd'][2 * i + 1]:.3f})")
        return results


def mean_fg_dice(results: Dict[str, list]) -> float:
    """Interleaved-mean foreground dice: (dc[0] + dc[2] + dc[4]) / 3 —
    the Advent/AdaptSeg/MCCL convention (Trainer_Advent.py:221)."""
    means = results["dc"][0::2]
    return float(np.mean(means))
