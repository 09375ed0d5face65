#!/bin/bash
# Round-3 headline polish: the round-2 long-schedule recipe (40 epochs,
# contrastive warmup 15, MCCL+RAIN+eps, seed 0 -> 0.837) rerun with the
# round-3 eps clamp (rain.eps_clip=3.0), which lifted 4/5 seeds on the
# 30-epoch ladder. Seed-paired against runs/mcclrain_eps_long_s0.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
RD=runs/rain_pre40/pretrain_rain.synthetic.f0s0.drunet.bs16.lr0.0001
RAIN="rain.enabled=true rain.update_eps=true rain.eps_iters=2 rain.eps_clip=3.0 \
rain.vgg_ckpt=$RD/rain_encoder.npz rain.decoder_ckpt=$RD/rain_decoder.npz \
rain.fc_encoder_ckpt=$RD/rain_fc_encoder.npz \
rain.fc_decoder_ckpt=$RD/rain_fc_decoder.npz"

run2() { local t=$1; shift; timeout "$t" "$@" && return 0
  echo "RETRY (rc=$?): $*"; sleep 10; timeout "$t" "$@"; }

echo "=== long headline: mccl+rain+eps(clip3), 40 epochs, seed 0 ==="
rm -rf runs/mcclrain_epsclip_long_s0
run2 2700 python scripts/train.py method=mccl data.dataset=synthetic \
  data.gap=0.5 optim.optimizer=adam optim.lr=2e-3 optim.epochs=40 \
  contrastive.warmup_epochs=15 run.eval_frequency=1 run.seed=0 data.seed=0 \
  $RAIN run.out_dir=runs/mcclrain_epsclip_long_s0
echo LONG_HEADLINE_DONE
