#!/bin/bash
# MCCL+RAIN+eps rerun with the eps-step clamp (rain.eps_clip), seed-paired
# with the round-2 table (examples/README.md). Diagnoses/fixes the seed
# 13/42 regressions: the reference's (lr_eps / samp_loss) ascent scale is
# unbounded (Trainer_RAIN.py:133-147) and blows up late in training; per-
# epoch eps_step_norm / sampling_norm / seg_style_val are now logged.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
RD=runs/rain_pre40/pretrain_rain.synthetic.f0s0.drunet.bs16.lr0.0001
CLIP=${CLIP:-3.0}
COMMON="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam optim.lr=2e-3 \
optim.epochs=30 contrastive.warmup_epochs=10 run.eval_frequency=1 \
rain.enabled=true rain.update_eps=true rain.eps_iters=2 rain.eps_clip=$CLIP \
rain.vgg_ckpt=$RD/rain_encoder.npz rain.decoder_ckpt=$RD/rain_decoder.npz \
rain.fc_encoder_ckpt=$RD/rain_fc_encoder.npz \
rain.fc_decoder_ckpt=$RD/rain_fc_decoder.npz"

run2() { local t=$1; shift; timeout "$t" "$@" && return 0
  echo "RETRY (rc=$?): $*"; sleep 10; timeout "$t" "$@"; }

for s in ${SEEDS:-13 42 0 7 99}; do
  echo "=== mcclrain_eps_clip seed $s ==="
  rm -rf runs/mcclrain_epsclip_s$s
  run2 1800 python scripts/train.py method=mccl $COMMON \
    run.seed=$s data.seed=$s run.out_dir=runs/mcclrain_epsclip_s$s \
    || echo "SEED $s FAILED"
done
echo RAIN_LADDER_DONE
