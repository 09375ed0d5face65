#!/bin/bash
# Round-4 stage C: RAIN pretrain + the stylized-branch diagnostic co-trains
# (VERDICT r3 #5 — root-cause the s13 MCCL+RAIN regression).
#   1. rain_pre40: the shared 40-epoch RAIN pretrain (exports 4 component
#      ckpts consumed by every rain.* recipe; wiped with runs/ on migration)
#   2. mcclrain_epsclip_s13: co-train on the REGRESSING seed with the new
#      per-epoch stylized-branch diagnostics (style_hist_d, style_mean/std,
#      dice_style_c{1..3} vs dice_src_c{1..3}) in log.jsonl. Doubles as
#      repeat #2 of the table cell.
#   3. mcclrain_diag_s0: same recipe on a WINNING seed for contrast (r3
#      regeneration 0.783 stays the table entry; this lands in a diag dir).
# Guards: ckpt_best existence + rm -rf (ADVICE r3).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
FAIL=0
RD=runs/rain_pre40/pretrain_rain.synthetic.f0s0.drunet.bs16.lr0.0001
MCCL_APDX=mccl.synthetic.f0s0.drunet.bs16.lr0.002.tau0.1.p2.mmt0.9.inter1.soft.cnr4e-05.ph
RAIN="rain.enabled=true rain.update_eps=true rain.eps_iters=2 rain.eps_clip=3.0 \
rain.vgg_ckpt=$RD/rain_encoder.npz rain.decoder_ckpt=$RD/rain_decoder.npz \
rain.fc_encoder_ckpt=$RD/rain_fc_encoder.npz \
rain.fc_decoder_ckpt=$RD/rain_fc_decoder.npz"

run2() { local t=$1; shift; timeout "$t" "$@" && return 0
  echo "RETRY (rc=$?): $*"; sleep 10; timeout "$t" "$@"; }
step() { echo; echo "=== [$(date +%H:%M:%S)] $* ==="; }
train_step() { local d=$1 a=$2 t=$3; shift 3
  if [ -d "$d/$a/ckpt_best" ]; then echo "skip (ckpt_best present): $d"; return 0; fi
  rm -rf "$d"
  run2 "$t" "$@" || { echo "FAILED: $d"; FAIL=1; return 1; }; }

BASE0="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=0 data.seed=0"

step "rain_pre40 (shared RAIN pretrain, 40 ep)"
if [ ! -f $RD/rain_encoder.npz ]; then
  rm -rf runs/rain_pre40
  run2 6000 python scripts/train.py method=pretrain_rain $BASE0 \
    optim.lr=1e-4 optim.epochs=40 run.out_dir=runs/rain_pre40 \
    || { echo "FAILED: rain_pre40"; echo R4_STAGEC_FAILED; exit 1; }
fi

BASE13="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=13 data.seed=13"
step "seed 13: MCCL+RAIN+eps clip co-train (stylized-branch diagnostics)"
train_step runs/mcclrain_epsclip_s13 $MCCL_APDX 4500 \
  python scripts/train.py method=mccl $BASE13 optim.lr=2e-3 optim.epochs=30 \
  contrastive.warmup_epochs=10 $RAIN run.out_dir=runs/mcclrain_epsclip_s13

step "seed 0: MCCL+RAIN+eps clip co-train diagnostics rerun"
train_step runs/mcclrain_diag_s0 $MCCL_APDX 4500 \
  python scripts/train.py method=mccl $BASE0 optim.lr=2e-3 optim.epochs=30 \
  contrastive.warmup_epochs=10 $RAIN run.out_dir=runs/mcclrain_diag_s0

[ $FAIL -eq 0 ] && echo R4_STAGEC_DONE || echo R4_STAGEC_FAILED
