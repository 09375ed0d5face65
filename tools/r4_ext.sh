#!/bin/bash
# Round-4 extension queue, launched after tools/r4_priority.sh completes.
# Repeat #2 cells for the method table's remaining rows (VERDICT r3 #1),
# in value order:
#   D  plain MCCL, all 5 seeds (pairs vs advent + the mcclrain ordering)
#   E  MCCL+RAIN+eps(clip) repeats for seeds 7/42/99 (13/0 ran in priority)
#   F  staged RAIN fine-tune from the MCCL ckpt, s13 first (the seed whose
#      co-train regression motivated the protocol), then remaining seeds
#   G  baseline repeats (ordering vs UDA methods already robust -> last)
# Same pause protocol as r4_priority.sh (/tmp/r4_pause between steps).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
FAIL=0
MCCL_APDX=mccl.synthetic.f0s0.drunet.bs16.lr0.002.tau0.1.p2.mmt0.9.inter1.soft.cnr4e-05.ph
MCCLFT_APDX=mccl.synthetic.f0s0.drunet.bs16.lr0.0005.tau0.1.p2.mmt0.9.inter1.soft.cnr4e-05.ph
BASELINE_APDX=baseline.synthetic.f0s0.drunet.bs16.lr0.002
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
base_for() { echo "data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$1 data.seed=$1"; }

# ---- D: plain MCCL, all 5 seeds ------------------------------------------
for S in 7 13 0 42 99; do
  step "seed $S: plain MCCL (warmup 10/30)"
  train_step runs/mccl_s$S $MCCL_APDX 2400 \
    python scripts/train.py method=mccl $(base_for $S) optim.lr=2e-3 \
    optim.epochs=30 contrastive.warmup_epochs=10 run.out_dir=runs/mccl_s$S
done

# ---- E: co-train repeats, remaining seeds --------------------------------
for S in 7 42 99; do
  step "seed $S: MCCL+RAIN+eps clip co-train"
  train_step runs/mcclrain_epsclip_s$S $MCCL_APDX 2400 \
    python scripts/train.py method=mccl $(base_for $S) optim.lr=2e-3 \
    optim.epochs=30 contrastive.warmup_epochs=10 $RAIN \
    run.out_dir=runs/mcclrain_epsclip_s$S
done

# ---- F: staged RAIN+eps fine-tune from the MCCL checkpoint ---------------
for S in 13 7 0 42 99; do
  step "seed $S: staged RAIN+eps fine-tune"
  if [ -d "runs/mccl_s$S/$MCCL_APDX/ckpt_best" ]; then
    train_step runs/mcclrain_ft_s$S $MCCLFT_APDX 2400 \
      python scripts/train.py method=mccl $(base_for $S) optim.lr=5e-4 \
      optim.lr_warmup_epochs=3 optim.epochs=15 contrastive.warmup_epochs=0 \
      $RAIN run.init_from=runs/mccl_s$S/$MCCL_APDX/ckpt_best \
      run.out_dir=runs/mcclrain_ft_s$S
  else
    echo "ABORT ft seed $S: missing MCCL ckpt"; FAIL=1
  fi
done

# ---- G: baseline repeats --------------------------------------------------
for S in 0 7 42 13 99; do
  step "seed $S: baseline (source-only)"
  train_step runs/baseline_s$S $BASELINE_APDX 2400 \
    python scripts/train.py method=baseline $(base_for $S) optim.lr=2e-3 \
    optim.epochs=30 run.out_dir=runs/baseline_s$S
done

[ $FAIL -eq 0 ] && echo R4_EXT_DONE || echo R4_EXT_FAILED
