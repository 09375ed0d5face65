#!/bin/bash
# Round-4 priority TPU queue (fresh host: runs/ was lost to migration, so
# every chain regenerates its own prerequisites). Ordered so that each
# COMPLETED per-seed chain yields a full paired data point:
#   advent_s$S (repeat #2 of the AdvEnt table row, VERDICT r3 #1)
#   -> centers -> mpscl_final_s$S (repeat #2 of the MPSCL row, #1)
#   -> mpscl_w0_s$S (the paired w_mpcl on/off control, VERDICT r3 #2).
# Seed order 7,13,0,42,99: s7 showed the largest MPSCL-stage gain in r3,
# s13 is the anomalous seed, s0 re-pairs the r3 single-seed control on
# this host. Tail stages (reached only if time allows): RAIN pretrain +
# s13/s0 co-train diagnostics (VERDICT r3 #5).
#
# Pause protocol (1-core host, CLAUDE.md serialization rule): the queue
# checks /tmp/r4_pause BETWEEN steps and sleeps while it exists, so tests
# can run without starving a live training process.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
FAIL=0
MPSCL_APDX=mpscl.synthetic.f0s0.drunet.bs16.lr0.0002.st0.1m0.4.tt0.1m0.2.ccm0.9
MCCL_APDX=mccl.synthetic.f0s0.drunet.bs16.lr0.002.tau0.1.p2.mmt0.9.inter1.soft.cnr4e-05.ph
RD=runs/rain_pre40/pretrain_rain.synthetic.f0s0.drunet.bs16.lr0.0001
RAIN="rain.enabled=true rain.update_eps=true rain.eps_iters=2 rain.eps_clip=3.0 \
rain.vgg_ckpt=$RD/rain_encoder.npz rain.decoder_ckpt=$RD/rain_decoder.npz \
rain.fc_encoder_ckpt=$RD/rain_fc_encoder.npz \
rain.fc_decoder_ckpt=$RD/rain_fc_decoder.npz"

pause_gate() { while [ -f /tmp/r4_pause ]; do
  echo "[paused $(date +%H:%M:%S)] /tmp/r4_pause present"; sleep 30; done; }
run2() { local t=$1; shift; timeout "$t" "$@" && return 0
  echo "RETRY (rc=$?): $*"; sleep 10; timeout "$t" "$@"; }
step() { pause_gate; echo; echo "=== [$(date +%H:%M:%S)] $* ==="; }
train_step() { local d=$1 a=$2 t=$3; shift 3
  if [ -d "$d/$a/ckpt_best" ]; then echo "skip (ckpt_best present): $d"; return 0; fi
  rm -rf "$d"
  run2 "$t" "$@" || { echo "FAILED: $d"; FAIL=1; return 1; }; }

for S in 7 13 0 42 99; do
  BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
  ADIR=runs/advent_s$S/advent.synthetic.f0s0.drunet.bs16.lr0.002
  step "seed $S: AdvEnt"
  train_step runs/advent_s$S advent.synthetic.f0s0.drunet.bs16.lr0.002 4500 \
    python scripts/train.py method=advent $BASE optim.lr=2e-3 \
    optim.epochs=30 adv.w_dis=2e-4 run.out_dir=runs/advent_s$S
  step "seed $S: class centers"
  if [ ! -d "$ADIR/ckpt_best" ]; then
    echo "ABORT seed $S chain: no AdvEnt ckpt"; FAIL=1; continue
  elif [ ! -f runs/advent_s$S/centers.npy ]; then
    run2 1200 python scripts/gen_class_centers.py method=baseline $BASE \
      run.restore_from=$ADIR/ckpt_best out=runs/advent_s$S/centers.npy \
      || { echo "FAILED: centers seed $S"; FAIL=1; continue; }
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

# ---- tail (reached only if the mpscl chains finish early) ---------------
step "shared RAIN pretrain (40 ep)"
train_step runs/rain_pre40 pretrain_rain.synthetic.f0s0.drunet.bs16.lr0.0001 5400 \
  python scripts/train.py method=pretrain_rain data.dataset=synthetic \
  data.gap=0.5 optim.optimizer=adam optim.lr=1e-4 optim.epochs=40 \
  run.seed=0 data.seed=0 run.eval_frequency=10 run.out_dir=runs/rain_pre40
for S in 13 0; do
  BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
  step "seed $S: MCCL+RAIN+eps clip co-train (stylized diagnostics)"
  train_step runs/mcclrain_epsclip_s$S $MCCL_APDX 4500 \
    python scripts/train.py method=mccl $BASE optim.lr=2e-3 optim.epochs=30 \
    contrastive.warmup_epochs=10 $RAIN run.out_dir=runs/mcclrain_epsclip_s$S
done

[ $FAIL -eq 0 ] && echo R4_PRIORITY_DONE || echo R4_PRIORITY_FAILED
