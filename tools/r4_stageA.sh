#!/bin/bash
# Round-4 stage A: regenerate AdvEnt (30 ep) + class centers for seeds
# 7,42,13,99 on THIS host. These are (a) the warm-start inits for the
# 5-seed paired w_mpcl on/off control (VERDICT r3 #2) and (b) repeat #2
# for the AdvEnt row of the method table (VERDICT r3 #1 — the tabled
# values are repeat #1 from the round-2/3 hosts).
# Guards follow ADVICE r3: ckpt_best existence (not dir existence) + rm -rf.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
FAIL=0

run2() { local t=$1; shift; timeout "$t" "$@" && return 0
  echo "RETRY (rc=$?): $*"; sleep 10; timeout "$t" "$@"; }

for S in 7 42 13 99; do
  BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
  ADIR=runs/advent_s$S/advent.synthetic.f0s0.drunet.bs16.lr0.002
  echo; echo "=== [$(date +%H:%M:%S)] seed $S: AdvEnt ==="
  if [ ! -d "$ADIR/ckpt_best" ]; then
    rm -rf runs/advent_s$S
    run2 2400 python scripts/train.py method=advent $BASE optim.lr=2e-3 \
      optim.epochs=30 adv.w_dis=2e-4 run.out_dir=runs/advent_s$S \
      || { echo "SEED $S advent FAILED"; FAIL=1; continue; }
  fi
  echo "=== [$(date +%H:%M:%S)] seed $S: centers ==="
  if [ ! -f "runs/advent_s$S/centers.npy" ]; then
    run2 1200 python scripts/gen_class_centers.py method=baseline $BASE \
      run.restore_from=$ADIR/ckpt_best out=runs/advent_s$S/centers.npy \
      || { echo "SEED $S centers FAILED"; FAIL=1; }
  fi
done
[ $FAIL -eq 0 ] && echo R4_STAGEA_DONE || echo R4_STAGEA_FAILED
