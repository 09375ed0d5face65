#!/bin/bash
# Seed-0 probe matrix for the MPSCL advent-init recipe (VERDICT round-2 #2).
# Finding so far: restarting adam at lr=2e-3 on the AdvEnt-warm-started model
# destroys the init (val dice 0.75 -> 0.39 within 8 epochs, runs/mpscl_ainit_s0
# first attempt) — a warm-start continuation needs a fine-tune LR, exactly as
# the reference trains MPSCL at 2.5e-4 SGD from a pretrained model
# (Trainer_MPSCL.py, learning_rate config). This matrix isolates:
#   (a) does low-LR MPSCL continuation beat the AdvEnt best (0.753 s0)?
#   (b) is any gain from the contrastive terms, or just more epochs?
#       (control: same run, w_mpcl_s = w_mpcl_t = 0)
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
ADIR=runs/advent_s0/advent.synthetic.f0s0.drunet.bs16.lr0.002
COMMON="method=mpscl data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
optim.epochs=30 run.eval_frequency=1 run.seed=0 data.seed=0 adv.w_dis=2e-4 \
run.init_from=$ADIR/ckpt_best contrastive.init_centers=runs/advent_s0/centers.npy"

run2() { local t=$1; shift; timeout "$t" "$@" && return 0
  echo "RETRY (rc=$?): $*"; sleep 10; timeout "$t" "$@"; }

echo "=== probe A: mpscl advent-init lr 2e-4 ==="
rm -rf runs/probe_mpscl_lr2e4
run2 1800 python scripts/train.py $COMMON optim.lr=2e-4 \
  run.out_dir=runs/probe_mpscl_lr2e4 || echo "probe A FAILED"

echo "=== probe B: control — same but w_mpcl=0 (pure adversarial cont.) ==="
rm -rf runs/probe_adv_cont_lr2e4
run2 1800 python scripts/train.py $COMMON optim.lr=2e-4 \
  contrastive.w_mpcl_s=0.0 contrastive.w_mpcl_t=0.0 \
  run.out_dir=runs/probe_adv_cont_lr2e4 || echo "probe B FAILED"

echo "=== probe C: mpscl advent-init lr 5e-4 ==="
rm -rf runs/probe_mpscl_lr5e4
run2 1800 python scripts/train.py $COMMON optim.lr=5e-4 \
  run.out_dir=runs/probe_mpscl_lr5e4 || echo "probe C FAILED"

echo PROBE_DONE
