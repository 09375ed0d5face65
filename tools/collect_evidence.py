#!/usr/bin/env python
"""Sync the tiny per-run evidence files (summary.json, log.jsonl) from the
untracked runs/ tree into a tracked examples/evidence_r4/ dir.

runs/ is untracked (checkpoints are large) and host migrations re-clone the
repo, so committed copies of the per-epoch logs are the durable record the
method tables (examples/README.md) and the stats analyzers
(tools/method_stats.py, tools/rain_diag.py) are derived from. Checkpoints
and TB event files are deliberately NOT collected.

Usage: python tools/collect_evidence.py   (idempotent; prints what changed)
"""
import shutil
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
RUNS = ROOT / "runs"
DEST = ROOT / "examples" / "evidence_r4"

COLLECT = ("summary.json", "log.jsonl", "centers.npy")


def main():
    if not RUNS.is_dir():
        sys.exit("no runs/ directory")
    changed = 0
    for src in sorted(RUNS.rglob("*")):
        if not (src.is_file() and src.name in COLLECT):
            continue
        rel = src.relative_to(RUNS)
        dst = DEST / rel
        if dst.exists() and dst.stat().st_mtime >= src.stat().st_mtime \
                and dst.stat().st_size == src.stat().st_size:
            continue
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src, dst)
        changed += 1
        print(f"collected {rel}")
    print(f"{changed} file(s) updated under {DEST.relative_to(ROOT)}")


if __name__ == "__main__":
    main()
