#!/bin/bash
# Round-4 stage D (leftover repeats, lowest value-per-hour, run if the
# wall-clock allows): plain MCCL repeats, MCCL+RAIN co-train repeats,
# baseline repeats (VERDICT r3 #1). Each cell = repeat #2 vs the committed
# round-2/3 table value (tools/method_stats.py pairs them).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
FAIL=0
RD=runs/rain_pre40/pretrain_rain.synthetic.f0s0.drunet.bs16.lr0.0001
MCCL_APDX=mccl.synthetic.f0s0.drunet.bs16.lr0.002.tau0.1.p2.mmt0.9.inter1.soft.cnr4e-05.ph
BASELINE_APDX=baseline.synthetic.f0s0.drunet.bs16.lr0.002
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

# plain MCCL repeats (s13 first: pairs with the stage-C diagnosis)
for S in 13 7 42 99 0; do
  BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
  step "seed $S: plain MCCL (warmup 10/30)"
  train_step runs/mccl_s$S $MCCL_APDX 4500 \
    python scripts/train.py method=mccl $BASE optim.lr=2e-3 optim.epochs=30 \
    contrastive.warmup_epochs=10 run.out_dir=runs/mccl_s$S
done

# MCCL+RAIN+eps(clip) co-train repeats (s13/s0 done in stage C)
for S in 7 42 99; do
  BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
  step "seed $S: MCCL+RAIN+eps clip co-train"
  train_step runs/mcclrain_epsclip_s$S $MCCL_APDX 4500 \
    python scripts/train.py method=mccl $BASE optim.lr=2e-3 optim.epochs=30 \
    contrastive.warmup_epochs=10 $RAIN run.out_dir=runs/mcclrain_epsclip_s$S
done

# baseline repeats (most chaotic recipe; ordering vs UDA already robust)
for S in 7 42 13 99 0; do
  BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
  step "seed $S: baseline (source-only)"
  train_step runs/baseline_s$S $BASELINE_APDX 4500 \
    python scripts/train.py method=baseline $BASE optim.lr=2e-3 \
    optim.epochs=30 run.out_dir=runs/baseline_s$S
done

[ $FAIL -eq 0 ] && echo R4_STAGED_DONE || echo R4_STAGED_FAILED
