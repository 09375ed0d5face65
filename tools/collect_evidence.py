#!/usr/bin/env python
"""Sync the tiny per-run evidence files (summary.json, log.jsonl,
centers.npy) from the untracked runs/ tree into the tracked snapshot dir
(tools/evidence_lib.EVIDENCE).

runs/ is untracked (checkpoints are large) and host migrations re-clone the
repo, so committed copies of the per-epoch logs are the durable record the
method tables (examples/README.md) and the stats analyzers
(tools/method_stats.py, tools/rain_diag.py) are derived from. Checkpoints
and TB event files are deliberately NOT collected.

A destination file is rewritten whenever its CONTENT differs from the
source (ADVICE r4: the old mtime+size heuristic could skip a changed file
after a fresh checkout reset mtimes). Snapshot files whose source run no
longer exists are reported as orphans — kept, because the snapshot is the
only record of runs lost to host migrations, but made visible so a renamed
run can't silently feed the analyzers stale data.

Usage: python tools/collect_evidence.py   (idempotent; prints what changed)
"""
import filecmp
import shutil
import sys

from evidence_lib import EVIDENCE, ROOT, RUNS

COLLECT = ("summary.json", "log.jsonl", "centers.npy")


def main():
    if not RUNS.is_dir():
        sys.exit("no runs/ directory")
    changed = 0
    for src in sorted(RUNS.rglob("*")):
        if not (src.is_file() and src.name in COLLECT):
            continue
        rel = src.relative_to(RUNS)
        dst = EVIDENCE / rel
        if dst.exists() and filecmp.cmp(src, dst, shallow=False):
            continue
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src, dst)
        changed += 1
        print(f"collected {rel}")
    orphans = [p.relative_to(EVIDENCE) for p in sorted(EVIDENCE.rglob("*"))
               if p.is_file() and p.name in COLLECT
               and not (RUNS / p.relative_to(EVIDENCE)).exists()]
    for rel in orphans:
        print(f"orphan (no live source under runs/): {rel}")
    print(f"{changed} file(s) updated under {EVIDENCE.relative_to(ROOT)}"
          + (f"; {len(orphans)} orphan(s) kept" if orphans else ""))


if __name__ == "__main__":
    main()
