"""DRUNet — dilated-residual U-Net, the paper's native backbone.

TPU-native flax re-design of reference model/DRUNet.py (NHWC, bf16
activations, f32 norm stats). Architecture (reference DRUNet.py:13-169):

  Encoder (n_block stages, DRUNet.py:13-57): stage i has a double
  conv->LeakyReLU->BN block producing ``filters * 2**i`` channels (the skip),
  then from stage 2 onward the stage input is ``concat([block_out,
  pooled_prev])`` merged by a 1x1 conv before 2x max-pooling. (The
  reference's first-stage 1x1 merge conv exists but is skipped by its
  forward loop — DRUNet.py:50-53; we keep an unused twin so the parameter
  count matches the 13,483,844 / 13,484,104 oracles at DRUNet.py:185-186.)

  Bottleneck (DRUNet.py:60-79): `depth` serial 3x3 convs with dilation 2**i,
  output = sum of all intermediate activations.

  Decoder (DRUNet.py:82-124): per stage, nearest-2x upsample + 3x3 conv, skip
  concat, then double conv(+BN). With ``multilvl`` the feature map two
  modules before the end (channels = 2*filters) feeds an auxiliary
  classifier after bilinear upsample to input size (DRUNet.py:154-157).

  Heads: 1x1 main classifier on the 32-ch full-res decoder output; optional
  projection head (1x1 f->2f->f) applied to the decoder features *after* the
  classifier tap (DRUNet.py:160-163) — the contrastive feature space matching
  the (4, 32) class-center files.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .common import ConvBNAct, SegOutput, max_pool, torch_conv_init, upsample_bilinear, upsample_nearest


class _EncoderBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvBNAct(self.out_ch, dtype=self.dtype)(x, train)
        x = ConvBNAct(self.out_ch, dtype=self.dtype)(x, train)
        return x


class DRUNet(nn.Module):
    filters: int = 32
    in_channels: int = 3
    n_block: int = 4
    bottleneck_depth: int = 4
    n_class: int = 4
    multilvl: bool = False
    phead: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True) -> SegOutput:
        f = self.filters
        in_size = x.shape[1:3]
        x = x.astype(self.dtype)

        # ---------------- encoder ----------------
        skips = []
        res = None
        out = x
        for i in range(self.n_block):
            out_ch = f * 2 ** i
            block_out = _EncoderBlock(out_ch, dtype=self.dtype,
                                      name=f"encoder{i + 1}")(out, train)
            skips.append(block_out)
            if i == 0:
                # dead twin of the reference's skipped conv1_1 (param parity
                # with the 13,483,844-param oracle, DRUNet.py:50-53,185)
                nn.Conv(out_ch, (1, 1), kernel_init=torch_conv_init,
                        dtype=self.dtype, name="conv1_1")(
                    jnp.zeros((1, 1, 1, self.in_channels * 3), self.dtype))
                out = max_pool(block_out)
            else:
                merged = jnp.concatenate([block_out, res], axis=-1)
                merged = nn.Conv(out_ch, (1, 1), kernel_init=torch_conv_init,
                                 dtype=self.dtype, name=f"conv1_{i + 1}")(merged)
                merged = nn.leaky_relu(merged, 0.01)
                out = max_pool(merged)
            res = out

        # ---------------- bottleneck ----------------
        bneck_ch = f * 2 ** self.n_block
        acc = None
        b = out
        for i in range(self.bottleneck_depth):
            d = 2 ** i
            b = nn.Conv(bneck_ch, (3, 3), kernel_dilation=(d, d),
                        padding=[(d, d), (d, d)], kernel_init=torch_conv_init,
                        dtype=self.dtype, name=f"bottleneck{i + 1}")(b)
            b = nn.leaky_relu(b, 0.01)
            acc = b if acc is None else acc + b
        bottleneck = acc

        # ---------------- decoder ----------------
        out = bottleneck
        aux_feat = None
        n_modules = 2 * self.n_block
        mod_idx = 0
        for i in reversed(range(self.n_block)):
            out_ch = f * 2 ** i
            out = upsample_nearest(out)
            out = nn.Conv(out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                          kernel_init=torch_conv_init, dtype=self.dtype,
                          name=f"decoder1_{i + 1}")(out)
            out = jnp.concatenate([skips.pop(), out], axis=-1)
            mod_idx += 1
            out = ConvBNAct(out_ch, dtype=self.dtype,
                            name=f"decoder2_{i + 1}a")(out, train)
            out = ConvBNAct(out_ch, dtype=self.dtype,
                            name=f"decoder2_{i + 1}b")(out, train)
            if self.multilvl and mod_idx == n_modules - 3:
                aux_feat = out
            mod_idx += 1

        decoder_ft = out                                    # (N, H, W, f)
        pred = nn.Conv(self.n_class, (1, 1), kernel_init=torch_conv_init,
                       dtype=self.dtype, name="classifier")(decoder_ft)

        aux: Optional[jnp.ndarray] = None
        if self.multilvl:
            # reference F.interpolate(..., align_corners=True) (DRUNet.py:156)
            aux_up = upsample_bilinear(aux_feat, in_size, align_corners=True)
            aux = nn.Conv(self.n_class, (1, 1), kernel_init=torch_conv_init,
                          dtype=self.dtype, name="classifier1")(aux_up)

        if self.phead:
            h = nn.Conv(f * 2, (1, 1), kernel_init=torch_conv_init,
                        dtype=self.dtype, name="phead1")(decoder_ft)
            h = nn.relu(h)
            decoder_ft = nn.Conv(f, (1, 1), kernel_init=torch_conv_init,
                                 dtype=self.dtype, name="phead2")(h)

        return SegOutput(pred=pred, aux=aux, dcdr_ft=decoder_ft,
                         bottleneck=bottleneck)
