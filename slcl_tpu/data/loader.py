"""Host-side batching: shuffled epochs, drop_last, source/target zip.

Replaces torch DataLoader worker processes with a thread-pool prefetching
loader producing numpy NHWC batches ready for device put. Epoch pairing of
the two domains follows the reference's ``zip(content_loader, style_loader)``
semantics — epoch length = min of the two loaders (Trainer_MPSCL.py:104).
"""
from __future__ import annotations

import threading
import queue as queue_mod
from typing import Any, Dict, Iterator, Optional, Sequence

import numpy as np


def _collate(samples: Sequence[tuple]) -> tuple:
    cols = list(zip(*samples))
    out = []
    for col in cols:
        if isinstance(col[0], np.ndarray):
            out.append(np.stack(col))
        else:
            out.append(list(col))
    return tuple(out)


class Loader:
    """Minimal epoch-based loader: shuffle, batch, drop_last, prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, num_threads: int = 4,
                 prefetch: int = 4):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.ds)
        return n // self.bs if self.drop_last else (n + self.bs - 1) // self.bs

    def _indices(self):
        idx = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[tuple]:
        idx = self._indices()
        # propagate the epoch to the dataset so per-sample augmentation RNG
        # can be derived deterministically from (seed, epoch, index)
        if hasattr(self.ds, "set_epoch"):
            self.ds.set_epoch(self.epoch)
        self.epoch += 1
        n_batches = len(self)
        batches = [idx[i * self.bs:(i + 1) * self.bs] for i in range(n_batches)]

        if self.num_threads == 1:
            for b in batches:
                yield _collate([self.ds[int(i)] for i in b])
            return

        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(self.num_threads) as pool:
                for b in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(lambda i: self.ds[int(i)], b))
                    q.put(_collate(samples))
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


def device_prefetch(batch_iter, size: int = 2, put=None):
    """Overlap host->device transfer with compute: keep ``size`` batches'
    device transfers in flight ahead of the consumer. jax.device_put is
    async, so issuing the next batch's transfer before the current step's
    results are consumed pipelines PCIe/tunnel latency behind the TPU step
    (the reference's pinned-memory + non_blocking copies, TPU-style).

    ``put`` overrides the per-array transfer (e.g. a NamedSharding
    device_put for data-parallel meshes); it is called as ``put(array,
    key)`` so key-dependent shardings (spatial rows for image tensors
    only) are possible."""
    import collections

    import jax

    queue = collections.deque()

    def _put(batch):
        if put is None:
            return {k: (jax.device_put(v) if isinstance(v, np.ndarray) else v)
                    for k, v in batch.items()}
        return {k: (put(v, k) if isinstance(v, np.ndarray) else v)
                for k, v in batch.items()}

    for batch in batch_iter:
        queue.append(_put(batch))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def zip_domains(content_loader: Loader, style_loader: Loader,
                aug_counter: bool = False) -> Iterator[Dict[str, Any]]:
    """Yield UDA batches: ``{'img_s', 'lab_s', 'img_t'[, 'img_t_aug']}``.

    Mirrors the reference's per-batch tuple unpacking
    (Trainer_MPSCL.py:114-118, Trainer_MCCL.py:183-188).
    """
    for bc, bs in zip(content_loader, style_loader):
        if len(bc) == 4:  # vert=True source (AdaptEvery)
            batch = {"img_s": bc[0], "lab_s": bc[1], "vert_s": bc[2],
                     "names_s": bc[3]}
        else:
            batch = {"img_s": bc[0], "lab_s": bc[1], "names_s": bc[2]}
        if aug_counter:
            batch["img_t"] = bs[0]
            batch["img_t_aug"] = bs[1]
        else:
            batch["img_t"] = bs[0]
            batch["lab_t"] = bs[1]
        batch["names_t"] = bs[-1]
        yield batch
