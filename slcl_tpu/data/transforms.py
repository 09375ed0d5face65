"""Image transforms: decode, normalize, crop, remap (reference parity).

Host-side numpy/cv2 — these run in loader threads, off the device critical
path.
"""
from __future__ import annotations

from typing import Optional, Tuple

import cv2
import numpy as np

from .nifti import read_nii


def sample_rng(seed: int, epoch: int, index: int) -> np.random.Generator:
    """Deterministic per-sample augmentation RNG from (run seed, epoch, index).

    The reference draws augmentation randomness from the global numpy state
    (unseeded per worker), so its runs are not reproducible; here every
    sample's augmentation stream is pinned so two runs with the same config
    seed produce identical batches (the Loader pushes the epoch via
    ``dataset.set_epoch``).
    """
    return np.random.default_rng([abs(int(seed)), 0x5EED, int(epoch), int(index)])


def load_raw_data_mmwhs(img_path, mask_path=None):
    """Decode one MMWHS raw slice pair.

    Parity: reference utils/utils_.py:1002-1020 — read the per-slice NIfTI,
    take channel 0, crop rows 8:-8, pad 2 rows top/bottom with the image min
    (mask padded with 0), remap labels {205->1, 500->2, 600->3}.
    """
    img, _ = read_nii(img_path)
    # sitk array for a (H, W, 1) slice file -> (1, W, H)?? The reference
    # indexes [:, 8:-8, 0]: axis0 kept, axis1 cropped, axis2 squeezed.
    img = np.pad(img[:, 8:-8, 0], ((2, 2), (0, 0)), constant_values=img.min())
    mask = None
    if mask_path is not None:
        m, _ = read_nii(mask_path)
        m = np.pad(m[:, 8:-8, 0], ((2, 2), (0, 0)))
        mask = ((m == 205) * 1 + (m == 500) * 2 + (m == 600) * 3).astype(np.uint8)
    return img, mask


def normalize_minmax(img: np.ndarray, vmin: float, vmax: float) -> np.ndarray:
    """Clip-to-[0,1] window normalization (data_generator_mmwhs_raw.py:122-141)."""
    return np.clip((img.astype(np.float32) - vmin) / (vmax - vmin + 1e-7), 0, 1)


def normalize_percentile(img: np.ndarray, percent: float = 99.0) -> np.ndarray:
    """Percentile-window fallback when no per-patient CSV exists."""
    lower = 1.0 if percent == 99 else (0.0 if percent == 100 else float(percent))
    upper = 99.0 if percent == 99 else (100.0 if percent == 100 else float(percent))
    vmin, vmax = np.percentile(img, lower), np.percentile(img, upper)
    return normalize_minmax(img, vmin, vmax)


def normalize_zscore(img: np.ndarray) -> np.ndarray:
    return (img.astype(np.float32) - img.mean()) / (img.std() + 1e-7)


def crop_resize(image: np.ndarray, target_size: Tuple[int, int] = (224, 224),
                is_mask: bool = False, pad_value: float = 0) -> np.ndarray:
    """Centre pad-then-crop to target size (ImageProcessor.crop_resize,
    data_generator_mscmrseg.py:241-285). H, W arrays."""
    pad_value = 0 if is_mask else pad_value
    h, w = image.shape[:2]
    th, tw = target_size
    if h < th or w < tw:
        dh, dw = max(0, th - h), max(0, tw - w)
        image = cv2.copyMakeBorder(image, dh // 2, dh - dh // 2,
                                   dw // 2, dw - dw // 2,
                                   cv2.BORDER_CONSTANT, value=float(pad_value))
        h, w = image.shape[:2]
    x1 = max(0, int(round((w - tw) / 2.0)))
    y1 = max(0, int(round((h - th) / 2.0)))
    out = image[y1:y1 + th, x1:x1 + tw]
    if out.shape[:2] != (th, tw):
        interp = cv2.INTER_NEAREST if is_mask else cv2.INTER_AREA
        out = cv2.resize(out, (tw, th), interpolation=interp)
    return out


def remap_mask(mask: np.ndarray, mapping: dict) -> np.ndarray:
    out = np.zeros_like(mask, dtype=np.uint8)
    for raw, cls in mapping.items():
        out[mask == raw] = cls
    return out


def to_categorical(mask: np.ndarray, num_classes: int = 4) -> np.ndarray:
    """One-hot (H, W) -> (H, W, C) (data_generator_mscmrseg.py:22-45)."""
    return np.eye(num_classes, dtype=np.float32)[mask.astype(np.int64)]


# ---------------------------------------------------------------------------
# Augmentation
# ---------------------------------------------------------------------------
def simple_aug(image: np.ndarray, mask: Optional[np.ndarray],
               rng: Optional[np.random.Generator] = None,
               ang=(-15, 15), translate=(-0.1, 0.1), scale=(0.9, 1.1)):
    """Affine + hflip augmentation (ImageProcessor.simple_aug,
    data_generator_mscmrseg.py:96-150): rotate U(-15, 15) deg, translate
    U(-10%, 10%), scale U(0.9, 1.1), 50% horizontal flip; linear interp for
    the image (border = image min), nearest for the mask (border = 0)."""
    rng = rng or np.random.default_rng()
    rows, cols = image.shape[:2]
    a = rng.integers(ang[0], ang[1]) if ang[0] != ang[1] else ang[0]
    tx = rng.uniform(*translate) * cols
    ty = rng.uniform(*translate) * rows
    s = rng.uniform(*scale)
    M = cv2.getRotationMatrix2D((cols / 2, rows / 2), float(a), float(s))
    M[0, 2] += tx
    M[1, 2] += ty
    border = float(image.min()) if image.size else 0.0
    img = cv2.warpAffine(image, M, (cols, rows), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=border)
    msk = None
    if mask is not None:
        msk = cv2.warpAffine(mask, M, (cols, rows), flags=cv2.INTER_NEAREST,
                             borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    if rng.random() < 0.5:
        img = cv2.flip(img, 1)
        if msk is not None:
            msk = cv2.flip(msk, 1)
    return img, msk


def heavy_aug(image: np.ndarray, mask: Optional[np.ndarray],
              rng: Optional[np.random.Generator] = None, vmax: float = 1.0):
    """Heavy augmentation — native equivalents of the reference's imgaug
    pipeline (data_generator_mscmrseg.py:152-238: flips, rot90, affine, blur,
    additive noise, dropout, contrast). imgaug is not in this image; each op
    is applied with prob 0.5 like ``iaa.Sometimes(0.5, ...)``."""
    rng = rng or np.random.default_rng()
    img, msk = image.astype(np.float32), mask
    if rng.random() < 0.5:
        img = cv2.flip(img, 1)
        msk = cv2.flip(msk, 1) if msk is not None else None
    if rng.random() < 0.5:
        img = cv2.flip(img, 0)
        msk = cv2.flip(msk, 0) if msk is not None else None
    if rng.random() < 0.5:
        k = int(rng.integers(0, 4))
        img = np.rot90(img, k).copy()
        msk = np.rot90(msk, k).copy() if msk is not None else None
    img, msk = simple_aug(img, msk, rng, scale=(0.8, 1.2))
    if rng.random() < 0.5:  # gaussian blur
        sigma = rng.uniform(0.0, 1.0)
        if sigma > 0.05:
            img = cv2.GaussianBlur(img, (5, 5), sigma)
    if rng.random() < 0.5:  # additive gaussian noise
        img = img + rng.normal(0, 0.03 * vmax, img.shape).astype(np.float32)
    if rng.random() < 0.5:  # coarse dropout
        frac = rng.uniform(0.0, 0.05)
        n = int(frac * img.size / 64)
        for _ in range(n):
            y = int(rng.integers(0, max(1, img.shape[0] - 8)))
            x = int(rng.integers(0, max(1, img.shape[1] - 8)))
            img[y:y + 8, x:x + 8] = 0
    if rng.random() < 0.5:  # linear contrast
        img = img * rng.uniform(0.8, 1.2)
    return img, msk
