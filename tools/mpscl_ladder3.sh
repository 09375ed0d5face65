#!/bin/bash
# MPSCL final recipe ladder: AdvEnt warm-start + AdvEnt-generated class
# centers + FINE-TUNE LR (2e-4), seeds paired with the round-2 table.
# This is the executed form of the reference's init protocol
# (Trainer_MPSCL.py:306-331 loads centers from a pretrained model;
# Trainer_MPSCL trains at 2.5e-4 SGD from a pretrained model, NOT from
# scratch at the baseline 8e-4/2e-3).
# Probe evidence (tools/mpscl_probe_s0.sh, runs/probe_*):
#   - scratch zero-init (round 2):            s0 0.603, 5-seed mean 0.598
#   - baseline(source-only)-init:             s0 0.359 (init locks model)
#   - advent-init @ lr 2e-3 (restart-size LR): s0 0.619 (destroys init)
#   - advent-init @ lr 2e-4 (fine-tune LR):    s0 0.741  <- this ladder
#   - control w_mpcl=0 @ 2e-4:                collapses to ~0.55 (the MPCL
#     terms are what stabilizes the continuation)
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
COMMON="method=mpscl data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
optim.lr=2e-4 optim.epochs=30 run.eval_frequency=1 adv.w_dis=2e-4"

run2() { local t=$1; shift; timeout "$t" "$@" && return 0
  echo "RETRY (rc=$?): $*"; sleep 10; timeout "$t" "$@"; }

for s in ${SEEDS:-7 42 13 99}; do
  ADIR=runs/advent_s$s/advent.synthetic.f0s0.drunet.bs16.lr0.002
  if [ ! -d "$ADIR/ckpt_best" ]; then echo "SEED $s: no advent ckpt"; continue; fi
  if [ ! -f "runs/advent_s$s/centers.npy" ]; then
    echo "=== centers(advent) seed $s ==="
    run2 900 python scripts/gen_class_centers.py method=baseline \
      data.dataset=synthetic data.gap=0.5 run.seed=$s data.seed=$s \
      run.restore_from=$ADIR/ckpt_best out=runs/advent_s$s/centers.npy \
      || { echo "SEED $s centers FAILED"; continue; }
  fi
  echo "=== mpscl(advent-init, lr 2e-4) seed $s ==="
  rm -rf runs/mpscl_ainit2e4_s$s
  run2 1800 python scripts/train.py $COMMON \
    run.seed=$s data.seed=$s \
    run.init_from=$ADIR/ckpt_best \
    contrastive.init_centers=runs/advent_s$s/centers.npy \
    run.out_dir=runs/mpscl_ainit2e4_s$s || echo "SEED $s FAILED"
done
echo LADDER3_DONE
