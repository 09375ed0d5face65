"""Offline preprocessing tools (reference preprocess_data.py +
cal_sample_mean_std.py + the minmax-CSV generator).

Run manually before training on the raw datasets:
  python -m slcl_tpu.data.preprocess minmax-csv --data_dir ... --modality CT
  python -m slcl_tpu.data.preprocess nii-to-png-mmwhs --data_dir ... --out ...
"""
from __future__ import annotations

import argparse
import re
from glob import glob
from pathlib import Path

import cv2
import numpy as np

from .nifti import read_nii
from .transforms import crop_resize


def generate_minmax_csv(data_dir: str, modality: str, percent: float = 99.0,
                        out_dir: str = None) -> str:
    """Per-patient percentile window CSV ``{MOD}minmax{p}.csv``.

    Parity with the precomputed normalization-stats the raw loader expects
    (data_generator_mmwhs_raw.py:122-141): rows indexed ``img{pat}``, columns
    ``min{p}``/``max{p}`` computed over all slices of the patient.
    """
    import pandas as pd
    data_dir = Path(data_dir)
    out_dir = Path(out_dir or data_dir)
    mod = modality.upper()
    p = int(float(percent))
    lower = 1.0 if p == 99 else (0.0 if p == 100 else float(p))
    upper = 99.0 if p == 99 else (100.0 if p == 100 else float(p))

    per_pat = {}
    for folder in (f"{mod}_woGT", f"{mod}_withGT"):
        for fp in sorted(glob(str(data_dir / folder / "img*_slice*.nii"))):
            m = re.search(r"img(\d+)_slice", Path(fp).name)
            if not m:
                continue
            arr, _ = read_nii(fp)
            per_pat.setdefault(f"img{m.group(1)}", []).append(arr.ravel())
    rows = {}
    for key, chunks in sorted(per_pat.items()):
        vals = np.concatenate(chunks)
        rows[key] = {f"min{p}": float(np.percentile(vals, lower)),
                     f"max{p}": float(np.percentile(vals, upper))}
    df = pd.DataFrame.from_dict(rows, orient="index")
    out = out_dir / f"{mod}minmax{p}.csv"
    df.to_csv(out)
    return str(out)


def nii_to_png_mmwhs(data_dir: str, out_dir: str, modality: str,
                     crop: int = 224, percent: float = 99.0):
    """Raw volumes -> per-patient windowed PNGs (preprocess_data.py:101-138
    intent: 1/99-percentile window per patient, centre crop)."""
    data_dir, out_dir = Path(data_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    mod = modality.upper()
    for fp in sorted(glob(str(data_dir / f"{mod}_woGT" / "img*_slice*.nii"))):
        m = re.search(r"img(\d+)_slice(\d+)", Path(fp).name)
        arr, _ = read_nii(fp)
        sl = arr[:, :, 0] if arr.ndim == 3 else arr
        vmin, vmax = np.percentile(sl, 1), np.percentile(sl, 99)
        sl = np.clip((sl - vmin) / (vmax - vmin + 1e-7), 0, 1)
        sl = crop_resize(sl.astype(np.float32), (crop, crop))
        png = (sl * 255).astype(np.uint8)
        cv2.imwrite(str(out_dir / f"pat_{m.group(1)}_{mod.lower()}_{m.group(2)}.png"), png)


def nii_to_png_mscmrseg(data_dir: str, out_dir: str, crop: int = 224,
                        clahe: bool = False, target_spacing: float = 1.0):
    """MS-CMRSeg volumes -> per-slice PNGs: resample to ~1 mm in-plane,
    centre crop, optional CLAHE (reference preprocess_data.py:28-98)."""
    data_dir, out_dir = Path(data_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    cl = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)) if clahe else None
    for fp in sorted(glob(str(data_dir / "*.nii*"))):
        vol, spacing = read_nii(fp)
        if vol.ndim == 2:
            vol = vol[None]
        name = Path(fp).name.split(".")[0]
        for i, sl in enumerate(vol):
            # in-plane resample to target spacing
            sy = (spacing[-2] if len(spacing) >= 2 else 1.0) / target_spacing
            sx = (spacing[-1] if len(spacing) >= 1 else 1.0) / target_spacing
            if abs(sy - 1) > 1e-3 or abs(sx - 1) > 1e-3:
                sl = cv2.resize(sl.astype(np.float32), None, fx=sx, fy=sy,
                                interpolation=cv2.INTER_LINEAR)
            vmin, vmax = np.percentile(sl, 1), np.percentile(sl, 99)
            sl = np.clip((sl - vmin) / (vmax - vmin + 1e-7), 0, 1)
            sl = crop_resize(sl.astype(np.float32), (crop, crop))
            png = (sl * 255).astype(np.uint8)
            if cl is not None:
                png = cl.apply(png)
            cv2.imwrite(str(out_dir / f"{name}_{i}.png"), png)


def sample_mean_std_csv(data_dir: str, out_csv: str):
    """Per-patient mean/std CSV (cal_sample_mean_std.py parity)."""
    import pandas as pd
    rows = {}
    for fp in sorted(glob(str(Path(data_dir) / "*.png"))):
        img = cv2.imread(fp, cv2.IMREAD_GRAYSCALE).astype(np.float32)
        name = Path(fp).stem
        pat = "_".join(name.split("_")[:2])
        rows.setdefault(pat, []).append(img.ravel())
    out = {k: {"mean": float(np.concatenate(v).mean()),
               "std": float(np.concatenate(v).std())} for k, v in rows.items()}
    pd.DataFrame.from_dict(out, orient="index").to_csv(out_csv)
    return out_csv


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("minmax-csv")
    p1.add_argument("--data_dir", required=True)
    p1.add_argument("--modality", required=True)
    p1.add_argument("--percent", type=float, default=99.0)
    p1.add_argument("--out_dir", default=None)
    p2 = sub.add_parser("nii-to-png-mmwhs")
    p2.add_argument("--data_dir", required=True)
    p2.add_argument("--out", required=True)
    p2.add_argument("--modality", required=True)
    args = ap.parse_args()
    if args.cmd == "minmax-csv":
        print(generate_minmax_csv(args.data_dir, args.modality, args.percent,
                                  args.out_dir))
    elif args.cmd == "nii-to-png-mmwhs":
        nii_to_png_mmwhs(args.data_dir, args.out, args.modality)


if __name__ == "__main__":
    main()
