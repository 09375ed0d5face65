#!/bin/bash
# Round-4 main TPU queue (after tools/r4_stageA.sh). Strictly serialized.
# Stages, in value order (each idempotent via ckpt_best guards):
#  B  MPSCL protocol on/off arms, 5 seeds: runs/mpscl_final_s$S (w_mpcl on)
#     + runs/mpscl_w0_s$S (identical recipe, w_mpcl_s=w_mpcl_t=0) —
#     VERDICT r3 #2 (does the margin-contrastive term itself pay?) and
#     repeat #2 of the MPSCL table row (#1).
#  C  MCCL+RAIN+eps(clip) co-train with the round-4 stylized-branch
#     diagnostics for s13 (the regressing seed) and s0 (a winning seed) —
#     VERDICT r3 #5.
#  D  plain MCCL repeat for seeds 7/42/13/99 (s0 regenerated in r3) — #1,
#     and the s13 plain pairing for the diagnosis.
#  E  MCCL+RAIN+eps(clip) repeats for the remaining seeds 7/42/99 — #1.
#  F  baseline repeats for seeds 7/42/13/99 — #1 (most chaotic recipe,
#     lowest priority: its ordering vs UDA methods is already robust).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
FAIL=0
RD=runs/rain_pre40/pretrain_rain.synthetic.f0s0.drunet.bs16.lr0.0001
MCCL_APDX=mccl.synthetic.f0s0.drunet.bs16.lr0.002.tau0.1.p2.mmt0.9.inter1.soft.cnr4e-05.ph
MPSCL_APDX=mpscl.synthetic.f0s0.drunet.bs16.lr0.0002.st0.1m0.4.tt0.1m0.2.ccm0.9
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

# ---- stage B: MPSCL protocol, paired w_mpcl on/off, 5 seeds -------------
for S in 7 13 42 99 0; do
  BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
  ADIR=runs/advent_s$S/advent.synthetic.f0s0.drunet.bs16.lr0.002
  if [ ! -d "$ADIR/ckpt_best" ] || [ ! -f runs/advent_s$S/centers.npy ]; then
    echo "ABORT seed $S mpscl arms: missing AdvEnt ckpt/centers"; FAIL=1
    continue
  fi
  MP="method=mpscl $BASE optim.lr=2e-4 optim.lr_warmup_epochs=5 \
optim.epochs=30 adv.w_dis=2e-4 run.init_from=$ADIR/ckpt_best \
contrastive.init_centers=runs/advent_s$S/centers.npy"
  step "seed $S: MPSCL protocol (w_mpcl ON)"
  train_step runs/mpscl_final_s$S $MPSCL_APDX 2400 \
    python scripts/train.py $MP run.out_dir=runs/mpscl_final_s$S
  step "seed $S: MPSCL protocol control (w_mpcl=0)"
  train_step runs/mpscl_w0_s$S $MPSCL_APDX 2400 \
    python scripts/train.py $MP contrastive.w_mpcl_s=0.0 \
    contrastive.w_mpcl_t=0.0 run.out_dir=runs/mpscl_w0_s$S
done

# ---- stage C: diagnostic co-train runs (s13 regressing, s0 winning) -----
# s13 lands in the regen name (doubles as its repeat #2); s0 goes to a
# diag-specific dir so the r3 regeneration (0.783) stays the table entry.
BASE13="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=13 data.seed=13"
step "seed 13: MCCL+RAIN+eps clip co-train (w/ stylized-branch diagnostics)"
train_step runs/mcclrain_epsclip_s13 $MCCL_APDX 2400 \
  python scripts/train.py method=mccl $BASE13 optim.lr=2e-3 optim.epochs=30 \
  contrastive.warmup_epochs=10 $RAIN run.out_dir=runs/mcclrain_epsclip_s13
BASE0="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=0 data.seed=0"
step "seed 0: MCCL+RAIN+eps clip co-train diagnostics rerun"
train_step runs/mcclrain_diag_s0 $MCCL_APDX 2400 \
  python scripts/train.py method=mccl $BASE0 optim.lr=2e-3 optim.epochs=30 \
  contrastive.warmup_epochs=10 $RAIN run.out_dir=runs/mcclrain_diag_s0

# ---- stage D: plain MCCL repeats ----------------------------------------
for S in 13 7 42 99; do
  BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
  step "seed $S: plain MCCL (warmup 10/30)"
  train_step runs/mccl_s$S $MCCL_APDX 2400 \
    python scripts/train.py method=mccl $BASE optim.lr=2e-3 optim.epochs=30 \
    contrastive.warmup_epochs=10 run.out_dir=runs/mccl_s$S
done

# ---- stage E: co-train repeats, remaining seeds --------------------------
for S in 7 42 99; do
  BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
  step "seed $S: MCCL+RAIN+eps clip co-train"
  train_step runs/mcclrain_epsclip_s$S $MCCL_APDX 2400 \
    python scripts/train.py method=mccl $BASE optim.lr=2e-3 optim.epochs=30 \
    contrastive.warmup_epochs=10 $RAIN run.out_dir=runs/mcclrain_epsclip_s$S
done

# ---- stage F: baseline repeats -------------------------------------------
for S in 7 42 13 99; do
  BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
  step "seed $S: baseline (source-only)"
  train_step runs/baseline_s$S $BASELINE_APDX 2400 \
    python scripts/train.py method=baseline $BASE optim.lr=2e-3 \
    optim.epochs=30 run.out_dir=runs/baseline_s$S
done

[ $FAIL -eq 0 ] && echo R4_QUEUE_DONE || echo R4_QUEUE_FAILED
