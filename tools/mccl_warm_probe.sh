#!/bin/bash
# Probe: does the reference's pretrained-init protocol (validated for MPSCL
# in tools/mpscl_protocol.sh) also lift MCCL, the paper-proper method?
# Seed 0 only; winners go to a full seed ladder.
#   plain MCCL s0 (round 2):      0.639
#   MCCL+RAIN+eps s0 (round 2):   0.764
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
RD=runs/rain_pre40/pretrain_rain.synthetic.f0s0.drunet.bs16.lr0.0001
ADIR=runs/advent_s0/advent.synthetic.f0s0.drunet.bs16.lr0.002
COMMON="method=mccl data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
optim.epochs=30 run.eval_frequency=1 run.seed=0 data.seed=0 \
run.init_from=$ADIR/ckpt_best"
RAIN="rain.enabled=true rain.update_eps=true rain.eps_iters=2 rain.eps_clip=3.0 \
rain.vgg_ckpt=$RD/rain_encoder.npz rain.decoder_ckpt=$RD/rain_decoder.npz \
rain.fc_encoder_ckpt=$RD/rain_fc_encoder.npz \
rain.fc_decoder_ckpt=$RD/rain_fc_decoder.npz"

run2() { local t=$1; shift; timeout "$t" "$@" && return 0
  echo "RETRY (rc=$?): $*"; sleep 10; timeout "$t" "$@"; }

echo "=== P1: mccl warm, lr 2e-4, warmup 0 ==="
rm -rf runs/probe_mcclw_lr2e4
run2 1800 python scripts/train.py $COMMON optim.lr=2e-4 \
  contrastive.warmup_epochs=0 run.out_dir=runs/probe_mcclw_lr2e4

echo "=== P2: mccl warm, lr 5e-4, warmup 0 ==="
rm -rf runs/probe_mcclw_lr5e4
run2 1800 python scripts/train.py $COMMON optim.lr=5e-4 \
  contrastive.warmup_epochs=0 run.out_dir=runs/probe_mcclw_lr5e4

echo "=== P3: mccl warm + rain + eps(clip3), lr 2e-4, warmup 0 ==="
rm -rf runs/probe_mcclw_rain
run2 1800 python scripts/train.py $COMMON optim.lr=2e-4 \
  contrastive.warmup_epochs=0 $RAIN run.out_dir=runs/probe_mcclw_rain

echo MCCL_WARM_PROBE_DONE
