"""TensorBoard scalar logging (reference SummaryWriter usage,
utils_.py:48-66 + per-epoch scalar writes in every trainer). Falls back to
no-op when tensorboardX is unavailable."""
from __future__ import annotations

from typing import Dict, Optional


class TBWriter:
    def __init__(self, log_dir: str, enabled: bool = True):
        self._writer = None
        if enabled:
            try:
                from tensorboardX import SummaryWriter
                self._writer = SummaryWriter(log_dir)
            except Exception as e:
                print(f"TBWriter: tensorboardX unavailable ({e}); "
                      "TB scalars disabled — log.jsonl remains the record")
                self._writer = None

    def scalars(self, metrics: Dict[str, float], step: int,
                prefix: str = ""):
        if self._writer is None:
            return
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                self._writer.add_scalar(f"{prefix}{k}", v, step)

    def close(self):
        if self._writer is not None:
            self._writer.close()
