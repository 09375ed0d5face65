"""Vanilla U-Net backbone (reference model/unet_model.py + unet_parts.py).

64->1024 double-conv encoder, transposed-conv decoder (reference default
``bilinear=False``), single-output head. Exposed through the same
:class:`SegOutput` convention; the pre-head 64-ch decoder features serve as
``dcdr_ft``.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .common import ConvBNAct, SegOutput, max_pool, torch_conv_init


class _DoubleConv(nn.Module):
    out_ch: int
    mid_ch: int = 0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        mid = self.mid_ch or self.out_ch
        # UNet order: conv -> BN -> ReLU (reference unet_parts.py:15-22)
        x = ConvBNAct(mid, use_bias=False, bn_after_act=False,
                      dtype=self.dtype)(x, train)
        x = ConvBNAct(self.out_ch, use_bias=False, bn_after_act=False,
                      dtype=self.dtype)(x, train)
        return x


class UNet(nn.Module):
    n_class: int = 4
    base: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True) -> SegOutput:
        f = self.base
        x = x.astype(self.dtype)
        x1 = _DoubleConv(f, dtype=self.dtype, name="inc")(x, train)
        x2 = _DoubleConv(f * 2, dtype=self.dtype, name="down1")(max_pool(x1), train)
        x3 = _DoubleConv(f * 4, dtype=self.dtype, name="down2")(max_pool(x2), train)
        x4 = _DoubleConv(f * 8, dtype=self.dtype, name="down3")(max_pool(x3), train)
        x5 = _DoubleConv(f * 16, dtype=self.dtype, name="down4")(max_pool(x4), train)

        def up(x_small, skip, out_ch, name):
            x_up = nn.ConvTranspose(out_ch, (2, 2), strides=(2, 2),
                                    kernel_init=torch_conv_init,
                                    dtype=self.dtype, name=f"{name}_up")(x_small)
            cat = jnp.concatenate([skip, x_up], axis=-1)
            return _DoubleConv(out_ch, dtype=self.dtype, name=f"{name}_conv")(cat, train)

        y = up(x5, x4, f * 8, "up1")
        y = up(y, x3, f * 4, "up2")
        y = up(y, x2, f * 2, "up3")
        y = up(y, x1, f, "up4")
        logits = nn.Conv(self.n_class, (1, 1), kernel_init=torch_conv_init,
                         dtype=self.dtype, name="outc")(y)
        return SegOutput(pred=logits, aux=None, dcdr_ft=y, bottleneck=x5)
