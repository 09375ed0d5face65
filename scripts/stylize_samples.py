#!/usr/bin/env python
"""Dump RAIN style-transfer sample images (content | style | stylized grid).

The reference saves transferred images during MCCL training
(utils_.save_transferred_images_RAIN, Trainer_MCCL.py:209-216); this is the
standalone equivalent: load pretrained RAIN component checkpoints, stylize a
few source-domain images with target-domain styles, and write one PNG grid.

Usage:
  python scripts/stylize_samples.py rain.vgg_ckpt=... rain.decoder_ckpt=... \
      rain.fc_encoder_ckpt=... rain.fc_decoder_ckpt=... \
      [data.dataset=synthetic data.gap=0.5] [out=examples/rain_samples.png] [n=4]
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax  # noqa: F401

    from slcl_tpu.utils.jaxenv import configure_jax
    configure_jax()
    import jax.numpy as jnp
    import numpy as np

    from slcl_tpu.config import Config
    from slcl_tpu.data import prepare_datasets

    out_path = "examples/rain_samples.png"
    n = 4
    overrides = []
    for a in sys.argv[1:]:
        if a.startswith("out="):
            out_path = a.split("=", 1)[1]
        elif a.startswith("n="):
            n = int(a.split("=", 1)[1])
        else:
            overrides.append(a)
    cfg = Config.from_cli(overrides)
    cfg.rain.enabled = True
    cfg.method = "rain"

    from slcl_tpu.models.rain import RAIN
    from slcl_tpu.utils import torch_convert as tc

    rain = RAIN()
    x0 = jnp.zeros((1, cfg.data.crop, cfg.data.crop, 3), jnp.float32)
    rv = rain.init({"params": jax.random.PRNGKey(0),
                    "noise": jax.random.PRNGKey(1)}, x0, x0)
    params = dict(rv["params"])
    converters = {"encoder": tc.convert_vgg_rain_encoder,
                  "decoder": tc.convert_rain_decoder,
                  "fc_encoder": tc.convert_rain_fc,
                  "fc_decoder": tc.convert_rain_fc}
    for name, path in (("encoder", cfg.rain.vgg_ckpt),
                       ("decoder", cfg.rain.decoder_ckpt),
                       ("fc_encoder", cfg.rain.fc_encoder_ckpt),
                       ("fc_decoder", cfg.rain.fc_decoder_ckpt)):
        if not path or not os.path.exists(path):
            raise SystemExit(f"missing rain.{name} checkpoint: {path!r}")
        if str(path).endswith((".pth", ".pt")):
            sub = converters[name](tc.load_state_dict(path))
        else:
            sub = tc.load_tree_npz(path)["params"]
        merged, _ = tc.merge_pretrained(params[name], sub)
        params[name] = jax.tree.map(jnp.asarray, merged)

    ds = prepare_datasets(cfg)
    src, trg = ds["train_s"], ds["train_t"]
    imgs_c = np.stack([np.asarray(src[i][0]) for i in range(n)])
    imgs_s = np.stack([np.asarray(trg[i][0]) for i in range(n)])

    stylized, _ = rain.apply({"params": params}, jnp.asarray(imgs_c),
                             jnp.asarray(imgs_s), None,
                             method="style_transfer",
                             rngs={"noise": jax.random.PRNGKey(2)})
    stylized = np.asarray(stylized)

    def to_u8(x):  # each panel min-max normalized for display
        x = x.mean(-1) if x.ndim == 3 else x
        lo, hi = float(x.min()), float(x.max())
        return ((x - lo) / max(hi - lo, 1e-6) * 255).astype(np.uint8)

    rows = []
    for i in range(n):
        rows.append(np.concatenate([to_u8(imgs_c[i]), to_u8(imgs_s[i]),
                                    to_u8(stylized[i])], axis=1))
    grid = np.concatenate(rows, axis=0)
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    import cv2
    cv2.imwrite(out_path, grid)
    print(f"wrote {out_path}: {n} rows of [content | style | stylized]")


if __name__ == "__main__":
    main()
