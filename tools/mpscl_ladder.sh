#!/bin/bash
# MPSCL with the reference's executed init protocol (Trainer_MPSCL.py:
# 306-331): per seed, (1) source-only baseline pretrain, (2) class centers
# from its decoder features (scripts/gen_class_centers.py — the reference's
# class_center_ct_f0.npy is exactly this), (3) MPSCL warm-started from the
# baseline weights + those centers. Seed-paired with the round-2 method
# table (30 epochs, adam 2e-3, bs16, gap 0.5, adv.w_dis=2e-4).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
COMMON="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam optim.lr=2e-3 optim.epochs=30 run.eval_frequency=1"

# The tunneled TPU occasionally stalls (see memory: kill by PID + rerun);
# retry each stage once before giving up on the seed.
run2() {  # run2 <timeout_s> <cmd...>
  local t=$1; shift
  timeout "$t" "$@" && return 0
  echo "RETRY (rc=$? — possible tunnel stall): $*"
  sleep 10
  timeout "$t" "$@"
}

for s in ${SEEDS:-0 7 42 13 99}; do
  BDIR=runs/base_s$s/baseline.synthetic.f0s0.drunet.bs16.lr0.002
  if [ ! -d "$BDIR/ckpt_best" ]; then
    echo "=== baseline seed $s ==="
    rm -rf runs/base_s$s
    run2 1500 python scripts/train.py method=baseline $COMMON \
      run.seed=$s data.seed=$s run.out_dir=runs/base_s$s \
      || { echo "SEED $s baseline FAILED"; continue; }
  fi
  if [ ! -f "runs/base_s$s/centers.npy" ]; then
    echo "=== centers seed $s ==="
    run2 900 python scripts/gen_class_centers.py method=baseline \
      data.dataset=synthetic data.gap=0.5 run.seed=$s data.seed=$s \
      run.restore_from=$BDIR/ckpt_best out=runs/base_s$s/centers.npy \
      || { echo "SEED $s centers FAILED"; continue; }
  fi
  echo "=== mpscl(init) seed $s ==="
  rm -rf runs/mpscl_init_s$s
  run2 1500 python scripts/train.py method=mpscl $COMMON \
    run.seed=$s data.seed=$s adv.w_dis=2e-4 \
    run.init_from=$BDIR/ckpt_best \
    contrastive.init_centers=runs/base_s$s/centers.npy \
    run.out_dir=runs/mpscl_init_s$s || echo "SEED $s mpscl FAILED"
done
echo LADDER_DONE
