#!/bin/bash
# Round-5 queue, post-migration continuation #2 (2026-08-20 host re-clone).
# The migration wiped runs/ — including the RAIN pretrain and every MCCL
# checkpoint — so the co-train repeats and staged-ft arms (queue2 stages
# 6/8) are out of reach in the remaining wall-clock. What is still
# reachable with NO checkpoint dependency, in value order:
#   1  plain MCCL repeats (s13 first: repeat evidence for the 0.724 value
#      the s13 root-cause story anchors on; the MCCL row is the last with
#      no repeat-drift cell at all).
#   2  baseline repeats (ordering already robust — filler if hours remain).
# Same protocol as queue2: idempotent steps, collect_evidence after each,
# pause via /tmp/r5_pause, hold while the TPU probe says DOWN.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
FAIL=0
MCCL_APDX=mccl.synthetic.f0s0.drunet.bs16.lr0.002.tau0.1.p2.mmt0.9.inter1.soft.cnr4e-05.ph
BASELINE_APDX=baseline.synthetic.f0s0.drunet.bs16.lr0.002

pause_gate() { while [ -f /tmp/r5_pause ]; do
  echo "[paused $(date +%H:%M:%S)] /tmp/r5_pause present"; sleep 30; done
  while tail -1 /tmp/tpu_status 2>/dev/null | grep -q DOWN; do
    echo "[tpu down $(date +%H:%M:%S)] holding queue"; sleep 60; done; }
run2() { local t=$1; shift; timeout "$t" "$@" && return 0
  echo "RETRY (rc=$?): $*"; sleep 10; timeout "$t" "$@"; }
step() { pause_gate; echo; echo "=== [$(date +%H:%M:%S)] $* ==="; }
ev() { python tools/collect_evidence.py 2>/dev/null | tail -1; }
train_step() { local d=$1 a=$2 t=$3; shift 3
  if [ -d "$d/$a/ckpt_best" ]; then echo "skip (ckpt_best present): $d"; return 0; fi
  rm -rf "$d"
  run2 "$t" "$@" || { echo "FAILED: $d"; FAIL=1; return 1; }
  ev; }

for S in 13 7 42 99 0; do
  BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
  step "seed $S: plain MCCL (warmup 10/30)"
  train_step runs/mccl_s$S $MCCL_APDX 3300 \
    python scripts/train.py method=mccl $BASE optim.lr=2e-3 optim.epochs=30 \
    contrastive.warmup_epochs=10 run.out_dir=runs/mccl_s$S
done

for S in 7 42 13 99 0; do
  BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
  step "seed $S: baseline (source-only)"
  train_step runs/baseline_s$S $BASELINE_APDX 2700 \
    python scripts/train.py method=baseline $BASE optim.lr=2e-3 \
    optim.epochs=30 run.out_dir=runs/baseline_s$S
done

[ $FAIL -eq 0 ] && echo R5_QUEUE3_DONE || echo R5_QUEUE3_FAILED
