#!/bin/bash
# Round-5 TPU evidence queue — executes the campaign VERDICT r4 #1-#3 asked
# for, in value order (same host as round 4, warm caches, seed-7 chain done):
#  1  per-seed MPSCL chains (AdvEnt -> centers -> MPSCL on -> w_mpcl=0) for
#     the remaining seeds 13, 0, 42, 99 — completes the 2-repeat AdvEnt and
#     MPSCL table rows AND the 5/5-seed paired w_mpcl on/off control.
#  2  shared RAIN pretrain (seed 0, 40 ep) — prerequisite for every co-train.
#  3  s13 + s0 co-train diagnostics (stylized-branch metrics land in
#     log.jsonl; s13 doubles as its repeat #2) — the s13 root-cause runs.
#  4  s13 style_alpha=0.5 paired arm — the targeted-repair test.
#  5  plain MCCL repeats (13, 7, 42, 99).
#  6  co-train repeats (7, 42, 99).
#  7  baseline repeats (7, 42, 13, 99) — ordering already robust, low value.
#  8  staged RAIN+eps fine-tune arms (per seed, needs the MCCL ckpt).
# Every step is idempotent (skips when its ckpt_best exists) and is followed
# by tools/collect_evidence.py so the committed snapshot can never lag the
# runs/ tree by more than one step (VERDICT r4 #8).
# Pause protocol (1-core host): touch /tmp/r5_pause to hold the queue
# BETWEEN steps (for pytest/bench/dryrun); rm it to resume.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
FAIL=0
MPSCL_APDX=mpscl.synthetic.f0s0.drunet.bs16.lr0.0002.st0.1m0.4.tt0.1m0.2.ccm0.9
MCCL_APDX=mccl.synthetic.f0s0.drunet.bs16.lr0.002.tau0.1.p2.mmt0.9.inter1.soft.cnr4e-05.ph
MCCLFT_APDX=mccl.synthetic.f0s0.drunet.bs16.lr0.0005.tau0.1.p2.mmt0.9.inter1.soft.cnr4e-05.ph
BASELINE_APDX=baseline.synthetic.f0s0.drunet.bs16.lr0.002
RD=runs/rain_pre40/pretrain_rain.synthetic.f0s0.drunet.bs16.lr0.0001
RAIN="rain.enabled=true rain.update_eps=true rain.eps_iters=2 rain.eps_clip=3.0 \
rain.vgg_ckpt=$RD/rain_encoder.npz rain.decoder_ckpt=$RD/rain_decoder.npz \
rain.fc_encoder_ckpt=$RD/rain_fc_encoder.npz \
rain.fc_decoder_ckpt=$RD/rain_fc_decoder.npz"

pause_gate() { while [ -f /tmp/r5_pause ]; do
  echo "[paused $(date +%H:%M:%S)] /tmp/r5_pause present"; sleep 30; done
  # don't start a step into a known-dead TPU tunnel (the 2026-08-20 outage
  # burned a step timeout per attempt): wait while the background probe's
  # last line says DOWN; a stale/absent status file does not block.
  while tail -1 /tmp/tpu_status 2>/dev/null | grep -q DOWN; do
    echo "[tpu down $(date +%H:%M:%S)] holding queue"; sleep 60; done; }
run2() { local t=$1; shift; timeout "$t" "$@" && return 0
  echo "RETRY (rc=$?): $*"; sleep 10; timeout "$t" "$@"; }
step() { pause_gate; echo; echo "=== [$(date +%H:%M:%S)] $* ==="; }
ev() { python tools/collect_evidence.py 2>/dev/null | tail -1; }
train_step() { local d=$1 a=$2 t=$3; shift 3
  if [ -d "$d/$a/ckpt_best" ]; then echo "skip (ckpt_best present): $d"; return 0; fi
  rm -rf "$d"
  run2 "$t" "$@" || { echo "FAILED: $d"; FAIL=1; return 1; }
  ev; }

# ---- stage 1: MPSCL chains, remaining seeds ------------------------------
# (function so the 2026-08-20 migration recovery can interleave: the seed-13
# chain runs first, then the RAIN block — the round's only shot at the s13
# root cause — then the remaining chains; a linear 4-chain stage 1 would
# starve stages 2-4 of the round's TPU hours)
chain_seed() { local S=$1
  BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
  ADIR=runs/advent_s$S/advent.synthetic.f0s0.drunet.bs16.lr0.002
  step "seed $S: AdvEnt"
  train_step runs/advent_s$S advent.synthetic.f0s0.drunet.bs16.lr0.002 3600 \
    python scripts/train.py method=advent $BASE optim.lr=2e-3 \
    optim.epochs=30 adv.w_dis=2e-4 run.out_dir=runs/advent_s$S
  step "seed $S: class centers"
  if [ ! -d "$ADIR/ckpt_best" ]; then
    echo "ABORT seed $S chain: no AdvEnt ckpt"; FAIL=1; return 1
  elif [ ! -f runs/advent_s$S/centers.npy ]; then
    run2 1200 python scripts/gen_class_centers.py method=baseline $BASE \
      run.restore_from=$ADIR/ckpt_best out=runs/advent_s$S/centers.npy \
      || { echo "FAILED: centers seed $S"; FAIL=1; return 1; }
    ev
  fi
  MP="method=mpscl $BASE optim.lr=2e-4 optim.lr_warmup_epochs=5 \
optim.epochs=30 adv.w_dis=2e-4 run.init_from=$ADIR/ckpt_best \
contrastive.init_centers=runs/advent_s$S/centers.npy"
  step "seed $S: MPSCL protocol (w_mpcl ON)"
  train_step runs/mpscl_final_s$S $MPSCL_APDX 2700 \
    python scripts/train.py $MP run.out_dir=runs/mpscl_final_s$S
  step "seed $S: MPSCL protocol control (w_mpcl=0)"
  train_step runs/mpscl_w0_s$S $MPSCL_APDX 2700 \
    python scripts/train.py $MP contrastive.w_mpcl_s=0.0 \
    contrastive.w_mpcl_t=0.0 run.out_dir=runs/mpscl_w0_s$S
}

chain_seed 13  # regressing RAIN seed: doubles as repeat-2 + w_mpcl pair

# ---- stage 2: shared RAIN pretrain ----------------------------------------
step "shared RAIN pretrain (40 ep, seed 0)"
if [ -f $RD/rain_encoder.npz ]; then echo "skip (rain_encoder.npz present)"
else
  rm -rf runs/rain_pre40
  run2 6000 python scripts/train.py method=pretrain_rain \
    data.dataset=synthetic data.gap=0.5 optim.optimizer=adam optim.lr=1e-4 \
    optim.epochs=40 run.seed=0 data.seed=0 run.eval_frequency=10 \
    run.out_dir=runs/rain_pre40 || { echo "FAILED: rain_pre40"; FAIL=1; }
  ev
fi

if [ -f $RD/rain_encoder.npz ]; then
  # ---- stage 3: co-train diagnostics (s13 regressing, s0 winning) --------
  for S in 13 0; do
    BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
    # (unlike r4_queue, s0 lands in the table name: the r3 regeneration was
    # lost with the old host's runs/ tree, so this IS s0's repeat #2)
    D=runs/mcclrain_epsclip_s$S
    step "seed $S: MCCL+RAIN+eps clip co-train (stylized-branch diagnostics)"
    train_step $D $MCCL_APDX 3600 \
      python scripts/train.py method=mccl $BASE optim.lr=2e-3 \
      optim.epochs=30 contrastive.warmup_epochs=10 $RAIN run.out_dir=$D
  done
  # ---- stage 4: s13 style_alpha repair arm --------------------------------
  BASE13="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=13 data.seed=13"
  step "seed 13: co-train with rain.style_alpha=0.5 (targeted repair)"
  train_step runs/mcclrain_alpha_s13 $MCCL_APDX 3600 \
    python scripts/train.py method=mccl $BASE13 optim.lr=2e-3 \
    optim.epochs=30 contrastive.warmup_epochs=10 $RAIN \
    rain.style_alpha=0.5 run.out_dir=runs/mcclrain_alpha_s13
else
  echo "SKIP stages 3-4: no RAIN pretrain"; FAIL=1
fi

# ---- stage 1 (cont.): remaining MPSCL chains ------------------------------
for S in 0 42 99; do chain_seed $S; done

# ---- stage 5: plain MCCL repeats ------------------------------------------
for S in 13 7 42 99 0; do
  BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
  step "seed $S: plain MCCL (warmup 10/30)"
  train_step runs/mccl_s$S $MCCL_APDX 2700 \
    python scripts/train.py method=mccl $BASE optim.lr=2e-3 optim.epochs=30 \
    contrastive.warmup_epochs=10 run.out_dir=runs/mccl_s$S
done

# ---- stage 6: co-train repeats --------------------------------------------
if [ -f $RD/rain_encoder.npz ]; then
  for S in 7 42 99; do
    BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
    step "seed $S: MCCL+RAIN+eps clip co-train"
    train_step runs/mcclrain_epsclip_s$S $MCCL_APDX 3600 \
      python scripts/train.py method=mccl $BASE optim.lr=2e-3 \
      optim.epochs=30 contrastive.warmup_epochs=10 $RAIN \
      run.out_dir=runs/mcclrain_epsclip_s$S
  done
fi

# ---- stage 7: baseline repeats --------------------------------------------
for S in 7 42 13 99 0; do
  BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
  step "seed $S: baseline (source-only)"
  train_step runs/baseline_s$S $BASELINE_APDX 2700 \
    python scripts/train.py method=baseline $BASE optim.lr=2e-3 \
    optim.epochs=30 run.out_dir=runs/baseline_s$S
done

# ---- stage 8: staged RAIN+eps fine-tune arms ------------------------------
if [ -f $RD/rain_encoder.npz ]; then
  for S in 13 7 42 99 0; do
    BASE="data.dataset=synthetic data.gap=0.5 optim.optimizer=adam \
run.eval_frequency=1 run.seed=$S data.seed=$S"
    if [ ! -d "runs/mccl_s$S/$MCCL_APDX/ckpt_best" ]; then
      echo "skip staged-ft seed $S: no MCCL ckpt"; continue
    fi
    step "seed $S: staged RAIN+eps fine-tune from the MCCL checkpoint"
    train_step runs/mcclrain_ft_s$S $MCCLFT_APDX 2700 \
      python scripts/train.py method=mccl $BASE optim.lr=5e-4 \
      optim.lr_warmup_epochs=3 optim.epochs=15 contrastive.warmup_epochs=0 \
      $RAIN run.init_from=runs/mccl_s$S/$MCCL_APDX/ckpt_best \
      run.out_dir=runs/mcclrain_ft_s$S
  done
fi

[ $FAIL -eq 0 ] && echo R5_QUEUE_DONE || echo R5_QUEUE_FAILED
