"""Legacy MS-CMRSeg bSSFP / LGE PNG datasets.

Parity: reference dataset/bSSFP_dataset.py and dataset/LGE_dataset.py — the
standalone few-shot/one-shot loaders kept alongside data_generator_mscmrseg
(no reference trainer imports them, but they are part of the public dataset
surface). Behavior reproduced:

  bSSFP (bSSFP_dataset.py:53-99): glob ``trainA/*bSSFP*.png`` +
  ``trainAmask``, center-crop to crop_size, mask remap {0:0, 85:1, 212:2,
  255:3}, simple_aug (fliplr/flipud + Sometimes(0.5) affine with shear
  ±12°, per-axis scale 0.8-1.2, translate x(-10%,5%) y(-10%,10%), rotate
  ±10°), /255 normalization.

  LGE (LGE_dataset.py:65-117): few-shot (``*_{pat}_lge*``), 'fulldata'
  (``pat*lge*``) and 'oneshot' modes; UNLABELED — returns (image, name), or
  (image, image_aug, name) with aug=True where image_aug passes the heavy
  pipeline (flips, affine rotate ±45 shear ±16 translate ±20% scale
  0.9-1.1, SomeOf(0-3) of {elastic, piecewise-affine, perspective, additive
  noise, dropout/coarse-dropout, blur}); virtual epoch length 609*400 except
  oneshot (LGE_dataset.py:101).

TPU-rebuild conventions: NHWC float32 in [0,1] (3-channel stack), int64
masks, per-(seed, epoch, index) seeded RNG so runs are reproducible (the
reference draws from the global imgaug RNG).
"""
from __future__ import annotations

from glob import glob
from pathlib import Path
from typing import Optional

import cv2
import numpy as np

from . import transforms as T

LEGACY_LABEL_MAP = {0: 0, 85: 1, 212: 2, 255: 3}
LGE_VIRTUAL_LEN = 609 * 400  # LGE_dataset.py:101


def _center_crop(img: np.ndarray, crop: int) -> np.ndarray:
    h, w = img.shape[:2]
    if w == crop and h == crop:
        return img
    by, bx = max((h - crop) // 2, 0), max((w - crop) // 2, 0)
    out = img[by:by + crop, bx:bx + crop]
    if out.shape[0] != crop or out.shape[1] != crop:
        out = cv2.resize(out.astype(np.float32), (crop, crop),
                         interpolation=cv2.INTER_NEAREST)
    return out


def _read_gray(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img


class BSSFPDataset:
    """Labeled bSSFP source split (reference bSSFPDataSet)."""

    def __init__(self, data_dir: str, crop: int = 224,
                 length: Optional[int] = None, augmentation: bool = True,
                 seed: int = 1234):
        self.data_dir = Path(data_dir)
        self.crop = crop
        self._length = length
        self.aug = augmentation
        self.seed = seed
        self._epoch = 0
        self.items = sorted(glob(str(self.data_dir / "trainA" / "*bSSFP*.png")))
        self.lab_dir = self.data_dir / "trainAmask"

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __len__(self):
        return self._length if self._length is not None else len(self.items)

    def __getitem__(self, index: int):
        fp = Path(self.items[index % len(self.items)])
        img = _read_gray(str(fp)).astype(np.float32)
        lab_fp = self.lab_dir / fp.name
        mask = _read_gray(str(lab_fp)) if lab_fp.exists() \
            else np.zeros_like(img, np.uint8)
        img = _center_crop(img, self.crop)
        mask = _center_crop(mask, self.crop)
        mask = T.remap_mask(mask, LEGACY_LABEL_MAP)
        rng = T.sample_rng(self.seed, self._epoch, index)
        if self.aug:
            # iaa.Sequential([Fliplr(.5), Flipud(.5), Sometimes(.5, Affine)],
            # random_order=True) — order does not matter for flips+affine
            # composition up to the same distribution family
            if rng.random() < 0.5:
                img, mask = cv2.flip(img, 1), cv2.flip(mask, 1)
            if rng.random() < 0.5:
                img, mask = cv2.flip(img, 0), cv2.flip(mask, 0)
            if rng.random() < 0.5:
                img, mask = T.affine_shear_aug(
                    img, mask, rng, rotate=(-10, 10), shear=(-12, 12),
                    translate_x=(-0.1, 0.05), translate_y=(-0.1, 0.1),
                    scale=(0.8, 1.2))
        img = img / 255.0
        return (np.stack([img] * 3, -1).astype(np.float32),
                mask.astype(np.int64), fp.name)


def lge_heavy_aug(img: np.ndarray, rng: np.random.Generator,
                  vmax: float = 255.0) -> np.ndarray:
    """The LGE unlabeled-target pipeline (LGE_dataset.py:12-62): flips +
    always-on affine + SomeOf(0-3) photometric/elastic ops, image only."""
    if rng.random() < 0.5:
        img = cv2.flip(img, 1)
    if rng.random() < 0.2:
        img = cv2.flip(img, 0)
    img, _ = T.affine_shear_aug(img, None, rng, rotate=(-45, 45),
                                shear=(-16, 16), translate_x=(-0.2, 0.2),
                                translate_y=(-0.2, 0.2), scale=(0.9, 1.1))

    def op_elastic(im):
        return T.elastic_deform(im, None, rng,
                                sigma=rng.uniform(0.5, 3.0), order=1)[0]

    def op_piecewise(im):
        return T.piecewise_affine(im, None, rng,
                                  scale=rng.uniform(0.01, 0.05))[0]

    def op_perspective(im):
        return T.perspective_warp(im, None, rng,
                                  scale=rng.uniform(0.01, 0.1))[0]

    def op_noise(im):
        return im + rng.normal(0, rng.uniform(0, 0.05) * vmax,
                               im.shape).astype(np.float32)

    def op_dropout(im):
        out = im.copy()
        if rng.random() < 0.5:  # pixel dropout
            keep = rng.random(im.shape[:2]) >= rng.uniform(0.01, 0.1)
            out = out * keep.astype(np.float32)
        else:                   # coarse dropout
            h, w = im.shape[:2]
            gh = max(int(h * rng.uniform(0.1, 0.2)), 1)
            gw = max(int(w * rng.uniform(0.1, 0.2)), 1)
            grid = rng.random((gh, gw)) >= rng.uniform(0.01, 0.05)
            keep = cv2.resize(grid.astype(np.float32), (w, h),
                              interpolation=cv2.INTER_NEAREST)
            out = out * keep
        return out

    def op_blur(im):
        c = rng.integers(0, 3)
        if c == 0:
            return cv2.GaussianBlur(im, (5, 5), rng.uniform(1.0, 1.75))
        if c == 1:
            k = int(rng.integers(2, 5))
            return cv2.blur(im, (k, k))
        k = int(rng.integers(1, 3)) * 2 + 1  # 3 or 5
        return cv2.medianBlur(im.astype(np.float32), k)

    ops = [op_elastic, op_piecewise, op_perspective, op_noise, op_dropout,
           op_blur]
    rng.shuffle(ops)
    for op in ops[:int(rng.integers(0, 4))]:
        img = op(img).astype(np.float32)
    return img


class LGEDataset:
    """Unlabeled LGE target split (reference LGEDataSet)."""

    def __init__(self, data_dir: str, crop: int = 224, pat_id: int = 0,
                 mode: str = "fewshot", augmentation: bool = False,
                 seed: int = 1234, virtual_len: Optional[int] = None):
        self.data_dir = Path(data_dir)
        self.crop = crop
        self.aug = augmentation
        self.seed = seed
        self._epoch = 0
        if mode == "fulldata":
            pat = "pat*lge*"
        else:
            pat = f"*_{pat_id}_lge*"
        self.items = sorted(glob(str(self.data_dir / "trainB" / f"{pat}.png")))
        if mode == "oneshot":
            self._length = len(self.items)
        else:
            self._length = (virtual_len if virtual_len is not None
                            else LGE_VIRTUAL_LEN)

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __len__(self):
        return self._length

    def __getitem__(self, index: int):
        fp = Path(self.items[index % len(self.items)])
        img = _read_gray(str(fp)).astype(np.float32)
        img = _center_crop(img, self.crop)
        if not self.aug:
            return (np.stack([img / 255.0] * 3, -1).astype(np.float32),
                    fp.name)
        rng = T.sample_rng(self.seed, self._epoch, index)
        img_aug = lge_heavy_aug(img, rng, vmax=255.0)
        return (np.stack([img / 255.0] * 3, -1).astype(np.float32),
                np.stack([img_aug / 255.0] * 3, -1).astype(np.float32),
                fp.name)
