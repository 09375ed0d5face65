"""torch -> flax weight converters (pretrained-encoder / RAIN import).

The reference loads ImageNet encoders through smp (reference
model/segmentation_models.py:26-33) and torchvision-style ResNet state dicts
for DeepLab (model/deeplabv2.py get_deeplab_v2 restore path), and the RAIN
stack requires AdaIN-style ``vgg_normalised.pth`` + decoder/fc checkpoints
(model/RAIN.py:124-157). This module converts those torch ``state_dict``s
into the flax parameter trees of :mod:`slcl_tpu.models` so
``cfg.model.pretrained`` and the ``cfg.rain.*_ckpt`` paths work on TPU.

Layout rules:
  conv weight  (O, I, kH, kW) -> kernel (kH, kW, I, O)
  linear weight (O, I)        -> kernel (I, O)
  BatchNorm weight/bias       -> params scale/bias
  BatchNorm running_mean/var  -> batch_stats mean/var

No torch import is needed for ``.npz`` inputs; ``.pth``/``.pt`` files are
read with torch (CPU) when available.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "load_state_dict",
    "convert_resnet_encoder",
    "convert_vgg_rain_encoder",
    "convert_rain_decoder",
    "convert_rain_fc",
    "merge_pretrained",
    "save_tree_npz",
    "load_tree_npz",
]


# ---------------------------------------------------------------------------
# IO helpers
# ---------------------------------------------------------------------------
def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into a flat {key: float32 ndarray} dict.

    Accepts raw state dicts, ``{'model_state_dict': ...}`` wrappers
    (reference callbacks.py save format), and ``.npz`` flat archives.
    """
    if str(path).endswith(".npz"):
        return {k: np.asarray(v, np.float32) for k, v in np.load(path).items()}
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy().astype(np.float32)
    return out


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _dense_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def save_tree_npz(path: str, **trees: Any) -> None:
    """Persist parameter trees as object arrays (the ``np.load(...,
    allow_pickle=True)['params'].item()`` convention the RAIN loader uses,
    slcl_tpu/train/trainer.py)."""
    np.savez(path, **{k: np.array(v, dtype=object) for k, v in trees.items()})


def load_tree_npz(path: str) -> Dict[str, Any]:
    loaded = dict(np.load(path, allow_pickle=True))
    return {k: v.item() for k, v in loaded.items()}


# ---------------------------------------------------------------------------
# ResNet encoders (torchvision state_dict naming)
# ---------------------------------------------------------------------------
def convert_resnet_encoder(
    sd: Dict[str, np.ndarray],
    layers: Sequence[int] = (3, 4, 6, 3),
    frozen_bn: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a torchvision-style ResNet state dict (``conv1.weight``,
    ``layer1.0.conv1.weight``, ``layer1.0.downsample.0.weight``, ...) into
    the (params, batch_stats) subtrees of :class:`ResNetUNet`'s encoder /
    :class:`DeepLabV2`'s trunk (module names ``conv1``/``bn1``/
    ``layer{L}_{i}`` with ``conv1..3``/``bn1..3``/``down_conv``/``down_bn``).

    ``fc.*`` / head keys are ignored — only the trunk is transferable
    (matching the reference's ``i_parts[1] != 'layer5'`` filter,
    model/deeplabv2.py get_deeplab_v2).
    """
    params: Dict[str, Any] = {}
    bstats: Dict[str, Any] = {}

    def put_bn(dst_p, dst_b, prefix):
        dst_p["scale"] = sd[f"{prefix}.weight"]
        dst_p["bias"] = sd[f"{prefix}.bias"]
        dst_b["mean"] = sd[f"{prefix}.running_mean"]
        dst_b["var"] = sd[f"{prefix}.running_var"]

    params["conv1"] = {"kernel": _conv_w(sd["conv1.weight"])}
    params["bn1"], bstats["bn1"] = {}, {}
    put_bn(params["bn1"], bstats["bn1"], "bn1")

    for li, blocks in enumerate(layers, start=1):
        for b in range(blocks):
            name = f"layer{li}_{b}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                p[f"conv{ci}"] = {"kernel": _conv_w(
                    sd[f"layer{li}.{b}.conv{ci}.weight"])}
                p[f"bn{ci}"], s[f"bn{ci}"] = {}, {}
                put_bn(p[f"bn{ci}"], s[f"bn{ci}"], f"layer{li}.{b}.bn{ci}")
            if f"layer{li}.{b}.downsample.0.weight" in sd:
                p["down_conv"] = {"kernel": _conv_w(
                    sd[f"layer{li}.{b}.downsample.0.weight"])}
                p["down_bn"], s["down_bn"] = {}, {}
                put_bn(p["down_bn"], s["down_bn"], f"layer{li}.{b}.downsample.1")
            params[name] = p
            bstats[name] = s
    del frozen_bn  # FrozenBatchNorm uses identical leaf names
    return params, bstats


# ---------------------------------------------------------------------------
# RAIN (AdaIN VGG Sequential naming — reference model/RAIN.py:8-121)
# ---------------------------------------------------------------------------
# Sequential index of each conv in the reference get_encoder() (through
# relu4_1, the slice load_rain_models keeps — RAIN.py:124-157) -> our name.
_VGG_ENC_MAP = {
    0: "conv0", 2: "conv1_1", 5: "conv1_2", 9: "conv2_1", 12: "conv2_2",
    16: "conv3_1", 19: "conv3_2", 22: "conv3_3", 25: "conv3_4", 29: "conv4_1",
}
# reference get_decoder() conv indices -> our VGGDecoder names
_VGG_DEC_MAP = {
    1: "d1", 5: "d2_0", 8: "d2_1", 11: "d2_2", 14: "d3", 18: "d4",
    21: "d5", 25: "d6", 28: "d7",
}


def _convert_sequential(sd: Dict[str, np.ndarray], index_map: Dict[int, str],
                        dense: bool = False) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key, val in sd.items():
        m = re.match(r"^(\d+)\.(weight|bias)$", key)
        if not m:
            continue
        idx, kind = int(m.group(1)), m.group(2)
        if idx not in index_map:
            continue  # e.g. vgg_normalised layers past relu4_1
        name = index_map[idx]
        dst = out.setdefault(name, {})
        if kind == "weight":
            dst["kernel"] = _dense_w(val) if dense else _conv_w(val)
        else:
            dst["bias"] = val
    return out


def convert_vgg_rain_encoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """``vgg_normalised.pth`` (Sequential indices 0..) -> VGGEncoder params."""
    return _convert_sequential(sd, _VGG_ENC_MAP)


def convert_rain_decoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return _convert_sequential(sd, _VGG_DEC_MAP)


def convert_rain_fc(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """fc_encoder / fc_decoder Sequential(Linear 0, 2, 4) -> Dense_0..2."""
    return _convert_sequential(
        sd, {0: "Dense_0", 2: "Dense_1", 4: "Dense_2"}, dense=True)


# ---------------------------------------------------------------------------
# merge
# ---------------------------------------------------------------------------
def merge_pretrained(tree: Any, sub: Dict[str, Any], path: str = "") -> Tuple[Any, list]:
    """Deep-merge converted weights into a flax tree, returning (new_tree,
    report). Leaves are shape-checked; keys absent from the destination are
    reported instead of silently dropped."""
    report: list = []

    def rec(dst, src, path):
        if not isinstance(src, dict):
            dst_arr = np.asarray(dst)
            src_arr = np.asarray(src, np.float32)
            if dst_arr.shape != src_arr.shape:
                raise ValueError(
                    f"shape mismatch at {path}: model {dst_arr.shape} vs "
                    f"checkpoint {src_arr.shape}")
            report.append(path)
            return src_arr
        if not isinstance(dst, dict):
            raise ValueError(f"cannot merge subtree into leaf at {path}")
        out = dict(dst)
        for k, v in src.items():
            if k not in out:
                report.append(f"!missing-in-model:{path}/{k}")
                continue
            out[k] = rec(out[k], v, f"{path}/{k}")
        return out

    return rec(tree, sub, path), report


def load_pretrained_encoder(path: str, backbone: str,
                            layers: Optional[Sequence[int]] = None
                            ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Resolve a checkpoint into encoder (params, batch_stats) for
    ``backbone`` in {'resnet50_unet', 'resnet50', 'deeplabv2'}.

    ``.npz`` files produced by scripts/convert_torch.py are loaded directly;
    ``.pth`` files are converted on the fly.
    """
    if str(path).endswith(".npz"):
        trees = load_tree_npz(path)
        return trees["params"], trees.get("batch_stats", {})
    sd = load_state_dict(path)
    if layers is None:
        layers = (3, 4, 23, 3) if backbone == "deeplabv2" else (3, 4, 6, 3)
    return convert_resnet_encoder(sd, layers)
