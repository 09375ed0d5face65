"""TPU-native serving: export a trained segmentor to a portable artifact.

The reference deploys by pickling a torch ``nn.Module`` and re-importing the
model code at serve time (``torch.save``/``load`` in its trainer checkpoints);
the TPU-native equivalent is **ahead-of-time export to StableHLO** via
``jax.export``: the jitted inference function — weights baked in as
constants — is serialized into one self-contained artifact that any process
with jax (and NO slcl_tpu model code) can deserialize and run on CPU or TPU.

Artifact = magic + JSON header (shape/class/backbone metadata) + the
``jax.export`` payload. The batch dimension is exported symbolically, so one
artifact serves any batch size; spatial dims stay static (XLA/MXU tiling
wants static shapes — resize on the host, not in the graph).

Produced by ``scripts/export.py``; round-trip tested in
``tests/test_export.py``; serving throughput measured by
``tools/bench_infer.py`` (PERF.md).
"""
from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

_MAGIC = b"SLCLX\x01"


def make_infer_fn(model, variables, *, pred_index: int = 0,
                  with_probs: bool = False) -> Callable:
    """Serving forward: image batch -> int32 label map (+ softmax probs).

    Mirrors ``eval.evaluator.Evaluator._build_infer`` (the evaluation
    convention: main logits, channel argmax; reference evaluator.py picks
    ``pred`` the same way) but closes the weights in, so the exported
    callable's only argument is the image batch.
    """
    import jax
    import jax.numpy as jnp

    def infer(x):
        out = model.apply(variables, x, False)
        pred = out.pred if pred_index == 0 else out.aux
        logits = pred.astype(jnp.float32)
        labels = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if with_probs:
            return labels, jax.nn.softmax(logits, axis=-1)
        return labels

    return infer


def export_segmentor(model, variables, *, crop: int, in_channels: int = 3,
                     pred_index: int = 0, with_probs: bool = False,
                     platforms: Tuple[str, ...] = ("cpu", "tpu"),
                     batch_symbol: str = "b"):
    """Export the segmentor's inference function to a ``jax.export.Exported``.

    ``platforms``: lowering targets baked into the artifact — the default
    ("cpu", "tpu") produces one artifact that runs on either, regardless of
    which backend performed the export (serve-anywhere; the CPU path doubles
    as the no-hardware integration-test path).

    ``batch_symbol``: name of the symbolic batch dimension ("" disables —
    fully static export).
    """
    import jax
    from jax import export as jexport

    infer = make_infer_fn(model, variables, pred_index=pred_index,
                          with_probs=with_probs)
    if batch_symbol:
        (b,) = jexport.symbolic_shape(batch_symbol)
    else:
        b = 1
    spec = jax.ShapeDtypeStruct((b, crop, crop, in_channels), jax.numpy.float32)
    return jexport.export(jax.jit(infer), platforms=list(platforms))(spec)


def save_artifact(path, exported, meta: Optional[Dict[str, Any]] = None) -> None:
    """Write ``exported`` + metadata as one file (see module docstring)."""
    meta = dict(meta or {})
    meta.setdefault("format", "slclx-v1")
    meta["platforms"] = list(getattr(exported, "platforms", ()))
    meta["in_avals"] = [str(a) for a in exported.in_avals]
    payload = exported.serialize()
    header = json.dumps(meta).encode()
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(p, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack(">I", len(header)))
        f.write(header)
        f.write(payload)


def load_artifact(path) -> Tuple[Callable, Dict[str, Any]]:
    """Load an artifact -> (jitted callable, metadata dict).

    Requires only jax — none of the slcl_tpu model code. The callable takes
    an (N, crop, crop, C) float32 batch; N is free when the artifact was
    exported with a symbolic batch.
    """
    import jax
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an slclx artifact "
                             f"(magic {magic!r})")
        (hlen,) = struct.unpack(">I", f.read(4))
        meta = json.loads(f.read(hlen).decode())
        payload = f.read()
    exported = jexport.deserialize(bytearray(payload))
    return jax.jit(exported.call), meta


def _main(argv) -> int:
    """``python -m slcl_tpu.serve model.slclx <img_or_dir> [out_dir] [bs=N]``

    Deployment-side batch server: load the artifact, glob grayscale images,
    run batched inference, write ``<stem>_pred.png`` class-id masks (x60 for
    visibility, matching scripts/predict.py). Uses only this module + cv2 —
    the consumer-side counterpart of scripts/export.py."""
    import sys

    import cv2
    import numpy as np

    if len(argv) < 2:
        print(_main.__doc__)
        return 2
    bs = int(next((a.split("=")[1] for a in argv if a.startswith("bs=")), "16"))
    argv = [a for a in argv if not a.startswith("bs=")]
    art, src = argv[0], Path(argv[1])
    out = Path(argv[2]) if len(argv) > 2 else Path("preds")
    out.mkdir(parents=True, exist_ok=True)

    fn, meta = load_artifact(art)
    crop = int(meta.get("crop", 224))
    paths = sorted(src.glob("*.png")) + sorted(src.glob("*.jpg")) \
        if src.is_dir() else [src]
    if not paths:
        print(f"no images under {src}")
        return 1

    def prep(p):
        g = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
        if g is None:
            raise ValueError(f"unreadable image {p}")
        g = cv2.resize(g, (crop, crop)).astype(np.float32)
        g = (g - g.mean()) / (g.std() + 1e-6)  # z-score, the eval convention
        return np.stack([g, g, g], axis=-1)

    n_done = 0
    for i in range(0, len(paths), bs):
        chunk = paths[i:i + bs]
        batch = np.stack([prep(p) for p in chunk])
        if len(chunk) < bs:  # static-shape pad (symbolic dim still wants
            batch = np.concatenate(  # one compile per distinct N)
                [batch, np.zeros((bs - len(chunk),) + batch.shape[1:],
                                 np.float32)])
        res = fn(batch)
        if isinstance(res, (tuple, list)):  # with_probs artifact: (labels, probs)
            res = res[0]
        labels = np.asarray(res)[:len(chunk)]
        for p, lab in zip(chunk, labels):
            cv2.imwrite(str(out / f"{p.stem}_pred.png"),
                        (lab * 60).astype(np.uint8))
        n_done += len(chunk)
    print(f"served {n_done} images -> {out} "
          f"({meta.get('method', '?')}/{meta.get('backbone', '?')})")
    return 0


if __name__ == "__main__":
    import sys
    raise SystemExit(_main(sys.argv[1:]))
