#!/usr/bin/env python
"""Error bars + resolvable-ordering analysis for the 5-seed method table
(VERDICT r3 #1).

Two repeats per cell:
  r1 = the committed round-2/3 measurements (examples/README.md tables,
       produced on the round-2/3 hosts) — hardcoded below with provenance;
  r2 = this host's regeneration (runs/<name>_s<seed>/*/summary.json).

Outputs (markdown to stdout):
  * per-method mean +/- between-seed std, per-cell repeat values,
  * the cross-repeat drift distribution (the benchmark's measured noise
    floor — same code, same seed, different host/XLA build),
  * paired per-seed comparisons for the orderings the README claims, each
    with a sign test (exact binomial) and a paired bootstrap CI of the mean
    difference computed over seed-level cell means,
  * a verdict per ordering: RESOLVABLE (CI excludes 0 and wins dominate) /
    NOT RESOLVABLE.

Statistical note: with n=5 seeds the smallest two-sided sign-test p is
2/32 = 0.0625, so "resolvable" here means the bootstrap CI excludes zero
AND no seed regresses; orderings inside the repeat-drift band are reported
as unresolved regardless of mean gap.
"""
import json
import sys
from itertools import product
from pathlib import Path

import numpy as np

from evidence_lib import ROOT, run_dir as _run_dir  # noqa: F401 (shared resolver:
# live runs/ takes precedence over the committed snapshot, falling back when
# the live dir is absent OR has produced no summary.json yet — ADVICE r4)

SEEDS = [0, 7, 42, 13, 99]

# repeat 1: the committed round-2/3 measurements, loaded from a tracked
# artifact so every README number is derivable from committed files
# (VERDICT r4 #7); see the file's provenance field.
_R2R3 = json.loads((ROOT / "examples" / "evidence_r2r3.json").read_text())
R1 = {m: {int(s): float(v) for s, v in cells.items()}
      for m, cells in _R2R3["cells"].items()}
LABEL = {
    "baseline": "baseline (source-only)",
    "advent": "AdvEnt",
    "mpscl_final": "MPSCL (reference init protocol)",
    "mccl": "MCCL (soft-labeled contrastive)",
    "mcclrain_epsclip": "MCCL+RAIN+eps (clip=3)",
}
# orderings the README claims, as (A, B) meaning "A > B"
ORDERINGS = [
    ("advent", "baseline"),
    ("mccl", "baseline"),
    ("mpscl_final", "advent"),
    ("mccl", "advent"),
    ("mcclrain_epsclip", "mccl"),
    ("mcclrain_epsclip", "advent"),
]


def regen_value(method: str, seed: int):
    d = _run_dir(f"{method}_s{seed}")
    vals = sorted(d.glob("*/summary.json"))
    if not vals:
        return None
    s = json.loads(vals[0].read_text())
    v = s.get("best_val_dice")
    return None if v is None else float(v)


def load_cells():
    """cells[method][seed] = list of repeat values (r1 [+ r2 if regenerated])."""
    cells = {}
    for m in R1:
        cells[m] = {}
        for s in SEEDS:
            reps = [R1[m][s]]
            r2 = regen_value(m, s)
            if r2 is not None:
                reps.append(r2)
            cells[m][s] = reps
    return cells


def bootstrap_ci(diffs, n=20000, alpha=0.05, rng=None):
    rng = rng or np.random.default_rng(0)
    diffs = np.asarray(diffs, float)
    idx = rng.integers(0, len(diffs), size=(n, len(diffs)))
    means = diffs[idx].mean(axis=1)
    return (float(np.quantile(means, alpha / 2)),
            float(np.quantile(means, 1 - alpha / 2)))


def sign_test_p(diffs):
    """Exact two-sided sign test (ties dropped)."""
    d = [x for x in diffs if x != 0]
    if not d:
        return 1.0
    k = sum(1 for x in d if x > 0)
    n = len(d)
    from math import comb
    tail = sum(comb(n, i) for i in range(0, min(k, n - k) + 1)) / 2 ** n
    return min(1.0, 2 * tail)


def init_dice(method: str, seed: int):
    """The epoch -1 warm-start init eval (run.init_from protocol) from the
    run's history — the AdvEnt-inherited floor of the best-selection."""
    d = _run_dir(f"{method}_s{seed}")
    vals = sorted(d.glob("*/summary.json"))
    if not vals:
        return None
    for rec in json.loads(vals[0].read_text()).get("history", []):
        if rec.get("epoch") == -1 and "val_dice" in rec:
            return float(rec["val_dice"])
    return None


def w_mpcl_control():
    """VERDICT r3 #2: does the margin-contrastive term itself pay? Paired
    same-host arms (identical recipe/warm start/LR; only w_mpcl_{s,t}
    zeroed in the control), all 5 seeds."""
    rows = []
    for s in SEEDS:
        on = regen_value("mpscl_final", s)
        off = regen_value("mpscl_w0", s)
        init = init_dice("mpscl_final", s)
        if on is None or off is None:
            continue
        rows.append((s, init, on, off))
    if not rows:
        print("\n(w_mpcl on/off arms not regenerated yet)")
        return
    print("\n## MPSCL margin-contrastive term: paired w_mpcl on/off "
          f"(same host, {len(rows)}/5 seeds)\n")
    print("| seed | AdvEnt-init floor | w_mpcl ON | w_mpcl=0 | Δ(on-off) | "
          "stage gain (on - init) |")
    print("|---|---|---|---|---|---|")
    d = []
    gains = []
    for s, init, on, off in rows:
        d.append(on - off)
        init_txt = f"{init:.3f}" if init is not None else "n/a"
        gain = (on - init) if init is not None else float("nan")
        gains.append(gain)
        print(f"| {s} | {init_txt} | {on:.3f} | {off:.3f} | {on - off:+.3f} "
              f"| {gain:+.3f} |")
    lo, hi = bootstrap_ci(d)
    w = sum(1 for x in d if x > 0)
    print(f"\nPaired Δ(on-off): mean {np.mean(d):+.3f} "
          f"[{lo:+.3f}, {hi:+.3f}] (95% bootstrap), wins {w}/{len(d)}, "
          f"sign-test p {sign_test_p(d):.3f}. "
          f"Mean stage gain over the init floor: {np.nanmean(gains):+.3f}.")


def staged_ft_row():
    """The zero-regression staged protocol (MCCL -> RAIN+eps fine-tune):
    paired against this host's plain-MCCL and co-train cells."""
    rows = []
    for s in SEEDS:
        ft = regen_value("mcclrain_ft", s)
        mccl = regen_value("mccl", s)
        co = regen_value("mcclrain_epsclip", s)
        if ft is None or mccl is None:
            continue
        rows.append((s, mccl, co, ft))
    if not rows:
        print("\n(staged-ft arms not regenerated yet)")
        return
    print(f"\n## Staged RAIN+eps fine-tune (same host, {len(rows)}/5 seeds)\n")
    print("| seed | plain MCCL | co-train | staged ft | Δ(ft-mccl) |")
    print("|---|---|---|---|---|")
    d = []
    for s, mccl, co, ft in rows:
        d.append(ft - mccl)
        co_txt = f"{co:.3f}" if co is not None else "n/a"
        print(f"| {s} | {mccl:.3f} | {co_txt} | {ft:.3f} | {ft - mccl:+.3f} |")
    regress = sum(1 for x in d if x < -0.005)
    print(f"\nΔ(ft-mccl): mean {np.mean(d):+.3f}, regressions (<-0.005): "
          f"{regress}/{len(d)}.")


def main():
    cells = load_cells()
    print("## Method table with dispersion (2 repeats x 5 seeds)\n")
    print("| method | " + " | ".join(f"s{s}" for s in SEEDS)
          + " | mean ± seed-std | repeat drift (mean / max |Δ|) |")
    print("|---|" + "---|" * (len(SEEDS) + 2))
    drift_all = []
    for m in R1:
        row, drifts = [], []
        for s in SEEDS:
            reps = cells[m][s]
            row.append("/".join(f"{v:.3f}" for v in reps))
            if len(reps) == 2:
                drifts.append(abs(reps[1] - reps[0]))
        means = [float(np.mean(cells[m][s])) for s in SEEDS]
        drift_all += [(m, d) for d in drifts]
        drift_txt = (f"{np.mean(drifts):.3f} / {np.max(drifts):.3f}"
                     if drifts else "n/a")
        print(f"| {LABEL[m]} | " + " | ".join(row)
              + f" | {np.mean(means):.3f} ± {np.std(means, ddof=1):.3f}"
              + f" | {drift_txt} |")
    if drift_all:
        ds = [d for _, d in drift_all]
        print(f"\nCross-host repeat drift over {len(ds)} cells: "
              f"median {np.median(ds):.3f}, mean {np.mean(ds):.3f}, "
              f"max {np.max(ds):.3f} "
              f"(worst: {max(drift_all, key=lambda t: t[1])[0]}).")

    print("\n## Paired orderings (seed-level cell means, n=5)\n")
    print("| claim | per-seed Δ | wins/ties/losses | mean Δ "
          "[95% bootstrap CI] | sign-test p | verdict |")
    print("|---|---|---|---|---|---|")
    for a, b in ORDERINGS:
        va = np.array([np.mean(cells[a][s]) for s in SEEDS])
        vb = np.array([np.mean(cells[b][s]) for s in SEEDS])
        d = va - vb
        lo, hi = bootstrap_ci(d)
        w = int((d > 0).sum())
        t = int((d == 0).sum())
        l = int((d < 0).sum())
        p = sign_test_p(d)
        resolvable = lo > 0 and l == 0
        verdict = "**RESOLVABLE**" if resolvable else "not resolvable"
        print(f"| {LABEL[a]} > {LABEL[b]} | "
              + " ".join(f"{x:+.3f}" for x in d)
              + f" | {w}/{t}/{l} | {np.mean(d):+.3f} [{lo:+.3f}, {hi:+.3f}]"
              + f" | {p:.3f} | {verdict} |")

    w_mpcl_control()
    staged_ft_row()


if __name__ == "__main__":
    main()
