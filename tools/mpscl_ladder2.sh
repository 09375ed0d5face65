#!/bin/bash
# MPSCL with the reference's executed init protocol, stage 2 (the working
# variant): warm-start from the ADVENT-pretrained UDA model + class centers
# generated from it — Trainer_MPSCL.py:306-331 loads exactly such a center
# file, and the MPSCL paper initializes from an adversarially-pretrained
# inter-modality model. (Stage 1 — source-only baseline init — measured
# 0.359 on seed 0: a source-overfit init locks the model and the
# adversarial branch cannot adapt it; see runs/mpscl_init_s0.)
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
COMMON="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam optim.lr=2e-3 optim.epochs=30 run.eval_frequency=1"

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
  echo "=== mpscl(advent-init) seed $s ==="
  rm -rf runs/mpscl_ainit_s$s
  run2 1800 python scripts/train.py method=mpscl $COMMON \
    run.seed=$s data.seed=$s adv.w_dis=2e-4 \
    run.init_from=$ADIR/ckpt_best \
    contrastive.init_centers=runs/advent_s$s/centers.npy \
    run.out_dir=runs/mpscl_ainit_s$s || echo "SEED $s mpscl FAILED"
done
echo LADDER2_DONE
