#!/bin/bash
# Round-4 stage B: paired MPSCL w_mpcl on/off arms (VERDICT r3 #2), seeds
# 7,13,42,99 — seed 0's pair is the committed r3 probe (0.741 on / 0.723
# off, tools/mpscl_probe_s0.sh). Both arms share the seed's AdvEnt warm
# start + centers from tools/r4_stageA.sh, so the comparison is paired at
# the checkpoint level. The ON arm doubles as repeat #2 of the MPSCL
# method-table row. Seed order = interest order (7: ft added +8.3 in r3;
# 13/99: init shipped verbatim; 42: middling).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
FAIL=0
MPSCL_APDX=mpscl.synthetic.f0s0.drunet.bs16.lr0.0002.st0.1m0.4.tt0.1m0.2.ccm0.9

run2() { local t=$1; shift; timeout "$t" "$@" && return 0
  echo "RETRY (rc=$?): $*"; sleep 10; timeout "$t" "$@"; }
step() { echo; echo "=== [$(date +%H:%M:%S)] $* ==="; }
train_step() { local d=$1 a=$2 t=$3; shift 3
  if [ -d "$d/$a/ckpt_best" ]; then echo "skip (ckpt_best present): $d"; return 0; fi
  rm -rf "$d"
  run2 "$t" "$@" || { echo "FAILED: $d"; FAIL=1; return 1; }; }

for S in 7 13 42 99; do
  BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
  ADIR=runs/advent_s$S/advent.synthetic.f0s0.drunet.bs16.lr0.002
  if [ ! -d "$ADIR/ckpt_best" ] || [ ! -f runs/advent_s$S/centers.npy ]; then
    echo "ABORT seed $S mpscl arms: missing AdvEnt ckpt/centers"; FAIL=1
    continue
  fi
  MP="method=mpscl $BASE optim.lr=2e-4 optim.lr_warmup_epochs=5 \
optim.epochs=30 adv.w_dis=2e-4 run.init_from=$ADIR/ckpt_best \
contrastive.init_centers=runs/advent_s$S/centers.npy"
  step "seed $S: MPSCL protocol (w_mpcl ON)"
  train_step runs/mpscl_final_s$S $MPSCL_APDX 4500 \
    python scripts/train.py $MP run.out_dir=runs/mpscl_final_s$S
  step "seed $S: MPSCL protocol control (w_mpcl=0)"
  train_step runs/mpscl_w0_s$S $MPSCL_APDX 4500 \
    python scripts/train.py $MP contrastive.w_mpcl_s=0.0 \
    contrastive.w_mpcl_t=0.0 run.out_dir=runs/mpscl_w0_s$S
done

[ $FAIL -eq 0 ] && echo R4_STAGEB_DONE || echo R4_STAGEB_FAILED
