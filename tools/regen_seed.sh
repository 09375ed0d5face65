#!/bin/bash
# Regenerate the full method-ladder evidence for ONE seed on the real TPU:
#   baseline, MCCL, AdvEnt (+class centers), MPSCL reference-init protocol,
#   MCCL+RAIN+eps (clip=3) co-train, staged RAIN fine-tune.
# Usage: SEED=7 tools/regen_seed.sh   (default seed 7)
# Requires the shared seed-0 RAIN pretrain (runs/rain_pre40, from
# tools/regen_s0_evidence.sh step 2).
# Idempotent-resume (ADVICE r3): every step skips only when its ckpt_best
# exists — an interrupted run (dir present, no best ckpt) is wiped and
# redone. REGEN_SEED_${S}_DONE is printed ONLY when every step succeeded;
# steps whose prerequisite checkpoint is missing are aborted, not run.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
S=${SEED:-7}
FAIL=0
BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
RD=runs/rain_pre40/pretrain_rain.synthetic.f0s0.drunet.bs16.lr0.0001
MCCL_APDX=mccl.synthetic.f0s0.drunet.bs16.lr0.002.tau0.1.p2.mmt0.9.inter1.soft.cnr4e-05.ph
MCCLFT_APDX=mccl.synthetic.f0s0.drunet.bs16.lr0.0005.tau0.1.p2.mmt0.9.inter1.soft.cnr4e-05.ph
BASELINE_APDX=baseline.synthetic.f0s0.drunet.bs16.lr0.002
MPSCL_APDX=mpscl.synthetic.f0s0.drunet.bs16.lr0.0002.st0.1m0.4.tt0.1m0.2.ccm0.9
RAIN="rain.enabled=true rain.update_eps=true rain.eps_iters=2 rain.eps_clip=3.0 \
rain.vgg_ckpt=$RD/rain_encoder.npz rain.decoder_ckpt=$RD/rain_decoder.npz \
rain.fc_encoder_ckpt=$RD/rain_fc_encoder.npz \
rain.fc_decoder_ckpt=$RD/rain_fc_decoder.npz"

run2() { local t=$1; shift; timeout "$t" "$@" && return 0
  echo "RETRY (rc=$?): $*"; sleep 10; timeout "$t" "$@"; }
step() { echo; echo "=== [$(date +%H:%M:%S)] seed $S: $* ==="; }
# train_step <out_dir> <apdx> <timeout> <cmd...>: skip iff ckpt_best exists;
# otherwise wipe the (possibly interrupted) dir and (re)train.
train_step() { local d=$1 a=$2 t=$3; shift 3
  if [ -d "$d/$a/ckpt_best" ]; then echo "skip (ckpt_best present): $d"; return 0; fi
  rm -rf "$d"
  run2 "$t" "$@" || { echo "FAILED: $d"; FAIL=1; return 1; }; }

[ -f $RD/rain_encoder.npz ] || { echo "missing shared RAIN pretrain $RD"; exit 1; }

step "baseline"
train_step runs/baseline_s$S $BASELINE_APDX 4500 python scripts/train.py \
  method=baseline $BASE optim.lr=2e-3 optim.epochs=30 \
  run.out_dir=runs/baseline_s$S

step "MCCL (warmup 10/30)"
train_step runs/mccl_s$S $MCCL_APDX 4500 python scripts/train.py \
  method=mccl $BASE optim.lr=2e-3 optim.epochs=30 \
  contrastive.warmup_epochs=10 run.out_dir=runs/mccl_s$S

step "AdvEnt"
ADIR=runs/advent_s$S/advent.synthetic.f0s0.drunet.bs16.lr0.002
train_step runs/advent_s$S advent.synthetic.f0s0.drunet.bs16.lr0.002 4500 \
  python scripts/train.py method=advent $BASE optim.lr=2e-3 \
  optim.epochs=30 adv.w_dis=2e-4 run.out_dir=runs/advent_s$S

step "class centers from the AdvEnt checkpoint"
if [ ! -d "$ADIR/ckpt_best" ]; then
  echo "ABORT centers: no AdvEnt ckpt"; FAIL=1
elif [ ! -f runs/advent_s$S/centers.npy ]; then
  run2 1200 python scripts/gen_class_centers.py method=baseline $BASE \
    run.restore_from=$ADIR/ckpt_best out=runs/advent_s$S/centers.npy \
    || { echo "FAILED: centers seed $S"; FAIL=1; }
fi

step "MPSCL reference init protocol"
if [ -d "$ADIR/ckpt_best" ] && [ -f runs/advent_s$S/centers.npy ]; then
  train_step runs/mpscl_final_s$S $MPSCL_APDX 4500 python scripts/train.py \
    method=mpscl $BASE optim.lr=2e-4 optim.lr_warmup_epochs=5 optim.epochs=30 \
    adv.w_dis=2e-4 run.init_from=$ADIR/ckpt_best \
    contrastive.init_centers=runs/advent_s$S/centers.npy \
    run.out_dir=runs/mpscl_final_s$S
else
  echo "ABORT mpscl_final: missing AdvEnt ckpt/centers"; FAIL=1
fi

step "MCCL+RAIN+eps co-train (clip=3)"
train_step runs/mcclrain_epsclip_s$S $MCCL_APDX 4500 python scripts/train.py \
  method=mccl $BASE optim.lr=2e-3 optim.epochs=30 \
  contrastive.warmup_epochs=10 $RAIN run.out_dir=runs/mcclrain_epsclip_s$S

step "staged RAIN+eps fine-tune from the MCCL checkpoint"
if [ -d "runs/mccl_s$S/$MCCL_APDX/ckpt_best" ]; then
  train_step runs/mcclrain_ft_s$S $MCCLFT_APDX 4500 python scripts/train.py \
    method=mccl $BASE optim.lr=5e-4 optim.lr_warmup_epochs=3 optim.epochs=15 \
    contrastive.warmup_epochs=0 $RAIN \
    run.init_from=runs/mccl_s$S/$MCCL_APDX/ckpt_best \
    run.out_dir=runs/mcclrain_ft_s$S
else
  echo "ABORT rain ft: missing MCCL ckpt"; FAIL=1
fi

[ $FAIL -eq 0 ] && echo REGEN_SEED_${S}_DONE || echo REGEN_SEED_${S}_FAILED
