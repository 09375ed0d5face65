#!/usr/bin/env python
"""Convert torch checkpoints to slcl_tpu .npz weight archives.

Usage:
  python scripts/convert_torch.py resnet50     resnet50-imagenet.pth enc.npz
  python scripts/convert_torch.py resnet101    resnet101.pth         enc.npz
  python scripts/convert_torch.py vgg_rain     vgg_normalised.pth    vgg.npz
  python scripts/convert_torch.py rain_decoder decoder.pth           dec.npz
  python scripts/convert_torch.py rain_fc      fc_encoder.pth        fce.npz

The outputs load via ``cfg.model.pretrained_ckpt`` (resnet kinds) or the
``cfg.rain.*_ckpt`` paths (rain kinds). ``.pth`` inputs can also be passed
to those config keys directly — this tool just makes the conversion a
one-time offline step (torch not needed afterwards).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from slcl_tpu.utils import torch_convert as tc  # noqa: E402

KINDS = ("resnet50", "resnet101", "vgg_rain", "rain_decoder", "rain_fc")


def main(argv):
    if len(argv) != 3 or argv[0] not in KINDS:
        print(__doc__)
        print("kinds:", ", ".join(KINDS))
        return 1
    kind, src, dst = argv
    sd = tc.load_state_dict(src)
    if kind in ("resnet50", "resnet101"):
        layers = (3, 4, 6, 3) if kind == "resnet50" else (3, 4, 23, 3)
        params, bstats = tc.convert_resnet_encoder(sd, layers)
        tc.save_tree_npz(dst, params=params, batch_stats=bstats)
    elif kind == "vgg_rain":
        tc.save_tree_npz(dst, params=tc.convert_vgg_rain_encoder(sd))
    elif kind == "rain_decoder":
        tc.save_tree_npz(dst, params=tc.convert_rain_decoder(sd))
    else:
        tc.save_tree_npz(dst, params=tc.convert_rain_fc(sd))
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
