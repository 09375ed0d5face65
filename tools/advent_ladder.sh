#!/bin/bash
# AdvEnt rerun under current round-3 code, seed-paired with the MPSCL-init
# ladder so the method comparison (examples/README.md) is same-code
# apples-to-apples.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
COMMON="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam optim.lr=2e-3 optim.epochs=30 run.eval_frequency=1 adv.w_dis=2e-4"

run2() { local t=$1; shift; timeout "$t" "$@" && return 0
  echo "RETRY (rc=$?): $*"; sleep 10; timeout "$t" "$@"; }

for s in ${SEEDS:-0 7 42 13 99}; do
  echo "=== advent seed $s ==="
  rm -rf runs/advent_r3_s$s
  run2 1800 python scripts/train.py method=advent $COMMON \
    run.seed=$s data.seed=$s run.out_dir=runs/advent_r3_s$s \
    || echo "SEED $s FAILED"
done
echo ADVENT_LADDER_DONE
