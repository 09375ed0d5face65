#!/usr/bin/env python
"""Stylized-branch diagnosis for the per-seed MCCL+RAIN regressions
(VERDICT r3 #5): compare the per-epoch RAIN diagnostics that
make_mccl_step logs (slcl_tpu/train/steps.py, r4 diagnostics block)
between a regressing seed and a winning seed.

Per-epoch columns (averaged over the epoch's steps by the trainer):
  style_hist_d   L1 distance between 32-bin intensity histograms of the
                 stylized batch and the source batch (style shift size)
  style_mean/std stylized-image intensity stats (src_mean for reference)
  dice_style_c*  soft train dice of the stylized branch per class
  dice_src_c*    soft train dice of the source branch per class (does the
                 net still fit the clean view?)
  sampling_norm  ||sampling|| after the eps update (VAE prior ~ sqrt(512)
                 ~= 22.6 for a unit-normal draw)
  eps_step_norm  norm of the applied eps ascent step (0 while warm-up)
  seg_style      stylized-branch CE+Jaccard; loss_consist bottleneck MSE

Usage: python tools/rain_diag.py [bad_run_dir] [good_run_dir]
Defaults: runs/mcclrain_epsclip_s13 vs runs/mcclrain_epsclip_s0.
"""
import json
import sys

import numpy as np

from evidence_lib import run_dir as _run_dir

KEYS = ["val_dice", "seg_s", "seg_style", "loss_consist", "style_hist_d",
        "style_mean", "style_std", "src_mean", "sampling_norm",
        "eps_step_norm", "dice_style_c1", "dice_style_c2", "dice_style_c3",
        "dice_src_c1", "dice_src_c2", "dice_src_c3"]


def load(run_ref):
    # shared resolver: live runs/ preferred, committed snapshot fallback;
    # accepts bare names, runs/-relative, or absolute paths (ADVICE r4)
    d = _run_dir(run_ref, marker="*/log.jsonl")
    logs = sorted(d.glob("*/log.jsonl"))
    if not logs:
        sys.exit(f"no log.jsonl under {d}")
    recs = [json.loads(l) for l in logs[0].read_text().splitlines() if l.strip()]
    return [r for r in recs if "epoch" in r]


def table(recs, label):
    print(f"\n### {label}\n")
    cols = [k for k in KEYS if any(k in r for r in recs)]
    print("| epoch | " + " | ".join(cols) + " |")
    print("|---|" + "---|" * len(cols))
    for r in recs:
        cells = []
        for k in cols:
            v = r.get(k)
            cells.append(f"{v:.3f}" if isinstance(v, (int, float)) else "")
        print(f"| {r['epoch']} | " + " | ".join(cells) + " |")


def summarize(bad, good):
    """Heuristic attribution: which diagnostic separates the seeds?"""
    def post_warm(recs, k):
        vals = [r[k] for r in recs if isinstance(r.get(k), (int, float))
                and r.get("epoch", -1) >= 0 and r.get(k) == r.get(k)]
        return np.array(vals[len(vals) // 3:]) if vals else None

    print("\n## Separating diagnostics (late-run means, bad vs good)\n")
    print("| diagnostic | bad seed | good seed | ratio |")
    print("|---|---|---|---|")
    for k in KEYS:
        b, g = post_warm(bad, k), post_warm(good, k)
        if b is None or g is None or not len(b) or not len(g):
            continue
        bm, gm = float(b.mean()), float(g.mean())
        ratio = bm / gm if gm else float("inf")
        print(f"| {k} | {bm:.3f} | {gm:.3f} | {ratio:.2f} |")


def trigger_check(recs, label, first_epochs=6, style_floor=0.05,
                  src_ceiling=0.85):
    """The round-5 trigger rule (examples/README.md "Round-5 root cause"):
    a stylized-branch class dice pinned ~0 through the first epochs while
    the source branch saturates means the stylized view of that class is
    unlearnable at the current strength — the run is at risk of the s13
    source-overfit collapse (0.410 vs 0.727 with rain.style_alpha=0.5)."""
    early = [r for r in recs if 0 < r.get("epoch", -1) < first_epochs]
    if not early:
        return
    for c in (1, 2, 3):
        sty = [r.get(f"dice_style_c{c}") for r in early]
        src = [r.get(f"dice_src_c{c}") for r in early]
        if None in sty or None in src:
            continue
        if max(sty) < style_floor and max(src) > src_ceiling:
            print(f"\nTRIGGER [{label}]: dice_style_c{c} <= "
                  f"{max(sty):.3f} while dice_src_c{c} reaches "
                  f"{max(src):.3f} over epochs 1-{first_epochs - 1} — "
                  "stylized view of this class is unlearnable; set "
                  "rain.style_alpha=0.5 (or lower) or use the staged "
                  "fine-tune protocol.")


def main():
    bad = sys.argv[1] if len(sys.argv) > 1 else "mcclrain_epsclip_s13"
    good = sys.argv[2] if len(sys.argv) > 2 else "mcclrain_epsclip_s0"
    rb, rg = load(bad), load(good)
    table(rb, f"bad seed: {_run_dir(bad, marker='*/log.jsonl').name}")
    table(rg, f"good seed: {_run_dir(good, marker='*/log.jsonl').name}")
    summarize(rb, rg)
    for recs, ref in ((rb, bad), (rg, good)):
        trigger_check(recs, _run_dir(ref, marker="*/log.jsonl").name)


if __name__ == "__main__":
    main()
