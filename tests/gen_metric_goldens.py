"""Generate surface-metric golden fixtures via brute-force geometry.

medpy itself is not installable in this image, so the committed goldens in
``tests/fixtures/metric_goldens.json`` are produced by an *independent exact
oracle*: border voxels extracted by the same erosion definition medpy
documents (mask minus its 1-connectivity erosion), then every directed
distance computed as an exact pairwise min over scipy.spatial.cdist —
no distance transform involved. The aggregation formulas are medpy's
documented ones (medpy.metric.binary):

  dc    = 2|A∩B| / (|A|+|B|)                       (0 when both empty)
  hd    = max(max d(A→B), max d(B→A))
  hd95  = 95th percentile of the POOLED d(A→B) ∪ d(B→A)
  asd   = mean d(A→B)                               (directed)
  assd  = (mean d(A→B) + mean d(B→A)) / 2           (mean of directed means)

Run: python tests/gen_metric_goldens.py  (rewrites the fixture file)
"""
import json
import os

import numpy as np
from scipy import ndimage
from scipy.spatial.distance import cdist

OUT = os.path.join(os.path.dirname(__file__), "fixtures",
                   "metric_goldens.json")


def border(mask):
    mask = mask.astype(bool)
    struct = ndimage.generate_binary_structure(mask.ndim, 1)
    return mask & ~ndimage.binary_erosion(mask, structure=struct,
                                          border_value=0)


def directed(a, b, spacing):
    pa = np.argwhere(border(a)).astype(float) * np.asarray(spacing)
    pb = np.argwhere(border(b)).astype(float) * np.asarray(spacing)
    return cdist(pa, pb).min(axis=1)


def oracle(gt, pred, spacing):
    d1 = directed(gt, pred, spacing)   # gt -> pred
    d2 = directed(pred, gt, spacing)
    pooled = np.hstack([d1, d2])
    inter = np.logical_and(gt, pred).sum()
    return {
        "dc": float(2.0 * inter / (gt.sum() + pred.sum())),
        "hd": float(pooled.max()),
        "hd95": float(np.percentile(pooled, 95)),
        "asd": float(d1.mean()),
        "assd": float((d1.mean() + d2.mean()) / 2.0),
    }


def blob(rng, s, r0, r1, cy, cx):
    yy, xx = np.mgrid[0:s, 0:s].astype(float)
    d = np.sqrt((yy - cy) ** 2 + ((xx - cx) / r1) ** 2)
    return (d < r0).astype(np.uint8)


def main():
    rng = np.random.default_rng(42)
    cases = []
    s = 48
    shapes = [
        ("disc_vs_shifted", blob(rng, s, 10, 1.0, 24, 24),
         blob(rng, s, 10, 1.0, 27, 22), [1.0, 1.0]),
        ("ellipse_vs_disc", blob(rng, s, 12, 1.6, 22, 25),
         blob(rng, s, 9, 1.0, 24, 24), [1.0, 1.0]),
        ("anisotropic", blob(rng, s, 11, 1.0, 24, 24),
         blob(rng, s, 8, 1.3, 20, 28), [2.0, 0.5]),
        ("small_vs_large", blob(rng, s, 4, 1.0, 12, 12),
         blob(rng, s, 16, 1.0, 28, 28), [1.0, 1.0]),
    ]
    noisy_gt = (rng.random((s, s)) < 0.4).astype(np.uint8)
    noisy_gt = ndimage.binary_closing(noisy_gt).astype(np.uint8)
    noisy_pr = np.roll(noisy_gt, (2, -1), axis=(0, 1))
    shapes.append(("noisy_rolled", noisy_gt, noisy_pr, [1.0, 1.0]))
    for name, gt, pred, spacing in shapes:
        cases.append({"name": name, "gt": gt.tolist(), "pred": pred.tolist(),
                      "spacing": spacing, **oracle(gt, pred, spacing)})
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(cases, f)
    print(f"wrote {len(cases)} cases to {OUT}")


if __name__ == "__main__":
    main()
