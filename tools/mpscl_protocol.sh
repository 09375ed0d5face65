#!/bin/bash
# THE MPSCL protocol (formerly mpscl_ladder4.sh; ladders 1-3 were the
# round-3 tuning history, collapsed in round 4), all 5 seeds under one recipe:
#   AdvEnt warm start (run.init_from) + AdvEnt class centers
#   + fine-tune LR 2e-4 + 5-epoch LR warmup (damps the fresh-Adam kick
#   that destabilized weak inits s13/s99 in ladder3) + the epoch -1
#   init eval (best-selection can never end below the init).
# This is the executed form of the reference's init protocol
# (Trainer_MPSCL.py:306-331).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
COMMON="method=mpscl data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
optim.lr=2e-4 optim.lr_warmup_epochs=5 optim.epochs=30 run.eval_frequency=1 \
adv.w_dis=2e-4"

run2() { local t=$1; shift; timeout "$t" "$@" && return 0
  echo "RETRY (rc=$?): $*"; sleep 10; timeout "$t" "$@"; }

for s in ${SEEDS:-0 7 42 13 99}; do
  ADIR=runs/advent_s$s/advent.synthetic.f0s0.drunet.bs16.lr0.002
  if [ ! -d "$ADIR/ckpt_best" ]; then echo "SEED $s: no advent ckpt"; continue; fi
  if [ ! -f "runs/advent_s$s/centers.npy" ]; then
    echo "=== centers(advent) seed $s ==="
    run2 900 python scripts/gen_class_centers.py method=baseline \
      data.dataset=synthetic data.gap=0.5 run.seed=$s data.seed=$s \
      run.restore_from=$ADIR/ckpt_best out=runs/advent_s$s/centers.npy \
      || { echo "SEED $s centers FAILED"; continue; }
  fi
  echo "=== mpscl FINAL protocol seed $s ==="
  rm -rf runs/mpscl_final_s$s
  run2 1800 python scripts/train.py $COMMON \
    run.seed=$s data.seed=$s \
    run.init_from=$ADIR/ckpt_best \
    contrastive.init_centers=runs/advent_s$s/centers.npy \
    run.out_dir=runs/mpscl_final_s$s || echo "SEED $s FAILED"
done
echo LADDER4_DONE
