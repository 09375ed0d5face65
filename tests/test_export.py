"""Serving-export round trip: slcl_tpu.serve (jax.export StableHLO artifact).

The artifact must (a) reproduce the live model exactly, (b) serve any batch
size (symbolic batch dim), (c) reload through plain jax with no model code,
(d) carry its metadata. CPU platform here; the same artifact embeds a tpu
lowering (serve.export_segmentor default platforms)."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slcl_tpu import serve
from slcl_tpu.models import build_segmentor
from slcl_tpu.config import Config


def _tiny_model(crop=32):
    cfg = Config()
    cfg.model.filters = 8
    cfg.model.n_block = 2
    cfg.model.bottleneck_depth = 2
    cfg.model.dtype = "float32"
    cfg.data.crop = crop
    model = build_segmentor(cfg.model)
    x0 = jnp.zeros((1, crop, crop, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, False)
    return cfg, model, variables


def test_export_roundtrip_polymorphic_batch(tmp_path, rng):
    crop = 32
    cfg, model, variables = _tiny_model(crop)
    exported = serve.export_segmentor(model, variables, crop=crop)
    assert "cpu" in exported.platforms and "tpu" in exported.platforms

    path = tmp_path / "tiny.slclx"
    serve.save_artifact(path, exported, {"method": "baseline",
                                         "backbone": "drunet", "crop": crop})
    fn, meta = serve.load_artifact(path)
    assert meta["method"] == "baseline" and meta["crop"] == crop
    assert meta["format"] == "slclx-v1"

    live = serve.make_infer_fn(model, variables)
    for bs in (2, 3):  # symbolic batch: one artifact, several batch sizes
        x = jnp.asarray(rng.normal(size=(bs, crop, crop, 3)).astype(np.float32))
        got = np.asarray(fn(x))
        want = np.asarray(live(x))
        assert got.shape == (bs, crop, crop) and got.dtype == np.int32
        np.testing.assert_array_equal(got, want)


def test_export_with_probs(tmp_path, rng):
    crop = 32
    cfg, model, variables = _tiny_model(crop)
    exported = serve.export_segmentor(model, variables, crop=crop,
                                      with_probs=True)
    path = tmp_path / "p.slclx"
    serve.save_artifact(path, exported)
    fn, _ = serve.load_artifact(path)
    x = jnp.asarray(rng.normal(size=(2, crop, crop, 3)).astype(np.float32))
    labels, probs = fn(x)
    probs = np.asarray(probs)
    assert probs.shape == (2, crop, crop, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(labels), probs.argmax(-1))


def test_artifact_rejects_foreign_file(tmp_path):
    p = tmp_path / "bogus.slclx"
    p.write_bytes(b"not an artifact at all")
    with pytest.raises(ValueError, match="magic"):
        serve.load_artifact(p)


def test_serve_dir_cli(tmp_path, rng):
    """python -m slcl_tpu.serve: artifact + image dir -> mask PNGs, incl. the
    ragged final batch (static-shape pad path)."""
    import cv2
    crop = 32
    cfg, model, variables = _tiny_model(crop)
    path = tmp_path / "m.slclx"
    serve.save_artifact(path, serve.export_segmentor(model, variables,
                                                     crop=crop),
                        {"crop": crop, "method": "baseline"})
    src = tmp_path / "imgs"
    src.mkdir()
    for i in range(3):  # 3 images at bs=2 -> one full + one ragged batch
        cv2.imwrite(str(src / f"s{i}.png"),
                    rng.integers(0, 255, (40, 40)).astype(np.uint8))
    rc = serve._main([str(path), str(src), str(tmp_path / "preds"), "bs=2"])
    assert rc == 0
    masks = sorted((tmp_path / "preds").glob("*_pred.png"))
    assert len(masks) == 3
    m = cv2.imread(str(masks[0]), cv2.IMREAD_GRAYSCALE)
    assert m.shape == (crop, crop) and set(np.unique(m)) <= {0, 60, 120, 180}


def test_serve_cli_with_probs_artifact(tmp_path, rng):
    """The serve CLI must handle artifacts exported with_probs=True
    (tuple-returning callable) by writing the label component."""
    import cv2
    crop = 32
    cfg, model, variables = _tiny_model(crop)
    path = tmp_path / "mp.slclx"
    serve.save_artifact(path, serve.export_segmentor(model, variables,
                                                     crop=crop,
                                                     with_probs=True),
                        {"crop": crop})
    src = tmp_path / "imgs"
    src.mkdir()
    cv2.imwrite(str(src / "a.png"),
                rng.integers(0, 255, (40, 40)).astype(np.uint8))
    rc = serve._main([str(path), str(src), str(tmp_path / "preds")])
    assert rc == 0
    assert (tmp_path / "preds" / "a_pred.png").exists()


def test_export_cli_smoke(tmp_path):
    """scripts/export.py end-to-end (fresh-init mode) incl. its own
    artifact-vs-live-model verification (smoke=1)."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import export as export_cli

    out = tmp_path / "cli.slclx"
    export_cli.main([f"out={out}", "smoke=1", "method=baseline",
                     "data.dataset=synthetic", "data.crop=32",
                     "model.filters=8", "model.n_block=2",
                     "model.bottleneck_depth=2", "model.dtype=float32",
                     f"run.out_dir={tmp_path / 'run'}"])
    assert out.exists() and out.stat().st_size > 1000
