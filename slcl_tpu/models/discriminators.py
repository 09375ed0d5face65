"""Discriminator zoo (reference model/GAN.py).

All return raw logits (BCE-with-logits applied in the loss), NHWC.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import conv_init, upsample_bilinear


class _ConvStack(nn.Module):
    """5-conv stride-2 stack with LeakyReLU(0.2) between (GAN.py:90-145)."""
    filters: Sequence[int] = (64, 128, 256, 512, 1)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        n = len(self.filters)
        for i, f in enumerate(self.filters):
            x = nn.Conv(f, (4, 4), strides=(2, 2), padding=[(2, 2), (2, 2)],
                        use_bias=False, kernel_init=conv_init(0.02),
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            if i < n - 1:
                x = nn.leaky_relu(x, 0.2)
        return x


class UncertaintyDiscriminator(nn.Module):
    """The discriminator actually used by AdaptSeg/AdvEnt/MPSCL
    (reference GAN.py:90-145): 5x [4x4 s2 p2 conv, no bias] with
    LeakyReLU(0.2), N(0, 0.02) init, logits out."""
    ext: bool = False
    base: int = 64  # width knob; 64 is reference-exact (stages double)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for i, f in enumerate((self.base, self.base * 2,
                               self.base * 4, self.base * 8)):
            x = nn.Conv(f, (4, 4), strides=(2, 2), padding=[(2, 2), (2, 2)],
                        use_bias=False, kernel_init=conv_init(0.02),
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = nn.leaky_relu(x, 0.2)
        if self.ext:
            x = nn.Conv(1024, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=False, kernel_init=conv_init(0.02),
                        dtype=self.dtype, name="conv4_2")(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Conv(256, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=False, kernel_init=conv_init(0.02),
                        dtype=self.dtype, name="conv4_3")(x)
            x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (4, 4), strides=(2, 2), padding=[(2, 2), (2, 2)],
                    use_bias=False, kernel_init=conv_init(0.02),
                    dtype=self.dtype, name="conv5")(x)
        return x


class OutputDiscriminator(nn.Module):
    """Conv stack preceded by bilinear upsample to 224 and optional softmax
    (reference GAN.py:53-87)."""
    softmax: bool = False
    size: int = 224
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = upsample_bilinear(x, (self.size, self.size))
        if self.softmax:
            x = jax.nn.softmax(x, axis=-1)
        return _ConvStack(dtype=self.dtype)(x)


class BoundaryDiscriminator(nn.Module):
    """Plain 5-conv stack on 1- or 3-channel input (GAN.py:148-210)."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return _ConvStack(dtype=self.dtype)(x)


class MLPDiscriminator(nn.Module):
    """4-layer MLP discriminator on flattened features (GAN.py:8-50)."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        for i, f in enumerate((4096, 2048, 1024)):
            x = nn.Dense(f, kernel_init=conv_init(0.02), dtype=self.dtype,
                         name=f"fc{i + 1}")(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Dense(1, kernel_init=conv_init(0.02), dtype=self.dtype,
                        name="fc4")(x)


class PatchGAN(nn.Module):
    """InstanceNorm PatchGAN used by DDFSeg (reference GAN.py:213-295):
    C64(s2) - C128(s2)+IN - C256(s2)+IN - C512(s1)+IN - C1(s1), 4x4 kernels,
    LeakyReLU(0.2); optional aux head returns a second logits map."""
    ndf: int = 64
    n_layers: int = 3
    aux: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        kw, pad = 4, 1
        x = nn.Conv(self.ndf, (kw, kw), strides=(2, 2),
                    padding=[(pad, pad), (pad, pad)], dtype=self.dtype,
                    kernel_init=conv_init(0.02), name="c0")(x)
        x = nn.leaky_relu(x, 0.2)
        mult = 1
        for n in range(1, self.n_layers):
            mult = min(2 ** n, 8)
            x = nn.Conv(self.ndf * mult, (kw, kw), strides=(2, 2),
                        padding=[(pad, pad), (pad, pad)], use_bias=True,
                        dtype=self.dtype, kernel_init=conv_init(0.02),
                        name=f"c{n}")(x)
            x = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                             use_scale=False, dtype=self.dtype,
                             name=f"in{n}")(x)  # InstanceNorm
            x = nn.leaky_relu(x, 0.2)
        mult = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * mult, (kw, kw), strides=(1, 1),
                    padding=[(pad, pad), (pad, pad)], dtype=self.dtype,
                    kernel_init=conv_init(0.02), name="c_last")(x)
        x = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                         use_scale=False, dtype=self.dtype, name="in_last")(x)
        x = nn.leaky_relu(x, 0.2)
        out = nn.Conv(1, (kw, kw), strides=(1, 1),
                      padding=[(pad, pad), (pad, pad)], dtype=self.dtype,
                      kernel_init=conv_init(0.02), name="head")(x)
        # inputs below ~32 px shrink the patch map to 0x0 and every
        # downstream mean becomes NaN — fail at trace time instead
        assert out.shape[1] > 0 and out.shape[2] > 0, (
            f"PatchGAN input too small: head produced {out.shape}")
        if self.aux:
            out_aux = nn.Conv(1, (kw, kw), strides=(1, 1),
                              padding=[(pad, pad), (pad, pad)], dtype=self.dtype,
                              kernel_init=conv_init(0.02), name="head_aux")(x)
            return out, out_aux
        return out
