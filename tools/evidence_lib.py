"""Shared run-evidence resolution for the analyzers and the collector.

The live ``runs/`` tree is untracked (checkpoints are large) and host
migrations re-clone the repo, so ``tools/collect_evidence.py`` mirrors each
run's tiny artifacts (summary.json, log.jsonl, centers.npy) into the tracked
snapshot at ``EVIDENCE``. Analyzers resolve a run through :func:`run_dir`,
which prefers the live tree but falls back to the snapshot — including when
the live dir exists but holds no artifacts yet (an in-progress or
interrupted regeneration must not shadow committed evidence; ADVICE r4).

This module is the single home of the snapshot location, previously
hardcoded in three tools (ADVICE r4).
"""
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
RUNS = ROOT / "runs"
# Snapshot dir name is historical ("r4" = the round the collector landed);
# it accumulates evidence from every round since.
EVIDENCE = ROOT / "examples" / "evidence_r4"


def _rel(name_or_path) -> Path:
    """Normalise a run reference (bare name, ``runs/``-relative path, or
    absolute path under ``runs/``) to its path relative to ``runs/``.
    Paths outside ``runs/`` are returned as-is (no snapshot equivalent)."""
    p = Path(name_or_path)
    if p.is_absolute():
        try:
            return p.relative_to(RUNS)
        except ValueError:
            return p
    if p.parts and p.parts[0] == "runs":
        return Path(*p.parts[1:])
    return p


def run_dir(name_or_path, marker: str = "*/summary.json") -> Path:
    """Resolve a run dir, preferring live ``runs/`` over the snapshot.

    ``marker`` is the glob (relative to the run dir) whose presence makes the
    live dir authoritative; when the live dir lacks it, the committed
    snapshot is used if it has the artifacts. Falls back to the live path so
    callers' "nothing found" errors name the expected location.
    """
    rel = _rel(name_or_path)
    if rel.is_absolute():  # outside runs/: caller's literal path
        return rel
    live = RUNS / rel
    if any(live.glob(marker)):
        return live
    snap = EVIDENCE / rel
    if any(snap.glob(marker)):
        return snap
    return live
