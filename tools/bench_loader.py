#!/usr/bin/env python
"""Host augmentation-pipeline benchmark: native C++ tier vs numpy fallback.

Measures per-sample cost of the aug ops that run in loader threads
(PERF.md "Native host tier") and the end-to-end synthetic heavy_aug2
counter-image pipeline. Pure host benchmark — no TPU needed.

Usage: python tools/bench_loader.py [n_iters]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timeit(fn, iters):
    t0 = time.perf_counter()
    for i in range(iters):
        fn(i)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from slcl_tpu import native
    from slcl_tpu.data import transforms as T
    from slcl_tpu.data.synthetic import SyntheticCardiacDataset

    rng = np.random.default_rng(0)
    img = rng.random((224, 224)).astype(np.float32)
    msk = rng.integers(0, 4, (224, 224)).astype(np.uint8)

    print(f"native tier available: {native.available()}")
    rows = []
    sp = lambda i: T.superpixels(img, np.random.default_rng(i), 100, 0.5)
    ha2 = lambda i: T.heavy_aug2(img, msk, np.random.default_rng(i))
    ds = SyntheticCardiacDataset(64, 224, "mr", 1, aug_counter=True,
                                 aug_mode="heavy2")
    item = lambda i: ds[i % len(ds)]

    for name, fn, n in (("superpixels(k=100)", sp, max(iters // 4, 3)),
                        ("heavy_aug2", ha2, iters),
                        ("synthetic heavy2 __getitem__", item, iters)):
        rows.append((name, timeit(fn, n), "native" if native.available()
                     else "numpy"))

    if native.available():  # same ops through the fallback
        native._LIB, native._TRIED = None, True
        try:
            rows.append(("superpixels(k=100)", timeit(sp, 2), "numpy"))
            rows.append(("heavy_aug2", timeit(ha2, max(iters // 4, 3)),
                         "numpy"))
        finally:
            native._TRIED = False

    print(f"{'op':<34} {'ms/sample':>10}  path")
    for name, ms, path in rows:
        print(f"{name:<34} {ms:>10.2f}  {path}")


if __name__ == "__main__":
    main()
