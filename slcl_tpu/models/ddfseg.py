"""DDFSeg: disentangled dual-stream CycleGAN UDA networks.

Flax re-design of reference model/DDFSeg.py (a TF->torch port in the
reference): shared content encoder ``EncoderC`` (3->512ch @ /8, no dropout —
DDFSeg.py:92 passes zero_rate=None), per-domain content refiners
``EncoderS`` (two dilated residual blocks + self-attention, dropout 0.25),
per-domain style encoders ``EncoderDiff`` (->32ch, dropout 0.25), the
SHARED latent decoder ``decoderc`` (544 -> 4*ngf, DDFSeg.py:253-270 — one
instance applied before BOTH per-domain image decoders, DDFSeg.py:315-319)
followed by per-domain image decoders (each of which contains its OWN inner
decoderc at 4*ngf -> 4*ngf, the reference ``decodera.decoder_block``,
DDFSeg.py:277) with tanh synthesis and skip-add of the input's middle
channel (DDFSeg.py:316, img[:, 1:2]), the full cross-domain swap + cycle
reconstruction in ``DDFNet`` (DDFSeg.py:295-345), and the ``SegDecoder``
(512 -> n_class with 3 deconvs, DDFSeg.py:348-374).

InstanceNorm is GroupNorm(group_size=1) with epsilon=1e-5 (torch
InstanceNorm2d default). Dropout placements/rates follow the reference's
``zero_rate`` arguments exactly (conv -> dropout -> norm -> relu order,
DDFSeg.py:29-43).

Documented repair: the reference's attention ``gamma`` is a plain Variable
never registered with the optimizer (DDFSeg.py:169) — it silently stays 0.
Here it is a real parameter initialized to 0 (the standard SAGAN recipe).

``slim=True`` on DDFNet/SegDecoder collapses the repeated identity-shaped
residual stacks to one block each — a compile-budget lever for CI and the
multichip dryrun (every op *kind*, norm flavor, and the full cross-domain
dataflow are preserved); trained configs always use the default depth.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

NGF = 32
_init = nn.initializers.truncated_normal  # stddev passed per layer


class _ConvBlock(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    stddev: float = 0.01
    norm: str = "batch"      # batch | ins | none
    relu: bool = True
    relufactor: float = 0.0
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_init=_init(self.stddev),
                    bias_init=nn.initializers.zeros, dtype=self.dtype)(x)
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if self.norm == "batch":
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        elif self.norm == "ins":
            x = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                             dtype=self.dtype)(x)
        if self.relu:
            x = nn.leaky_relu(x, self.relufactor) if self.relufactor else nn.relu(x)
        return x


class _ResBlock(nn.Module):
    features: int
    norm: str = "batch"
    dropout: float = 0.25
    dilation: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.dilation > 1:
            d = self.dilation
            y = nn.Conv(self.features, (3, 3), kernel_dilation=(d, d),
                        padding=[(d, d), (d, d)], kernel_init=_init(0.01),
                        dtype=self.dtype)(x)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(y)
            y = nn.relu(y)
            y = nn.Conv(self.features, (3, 3), kernel_dilation=(d, d),
                        padding=[(d, d), (d, d)], kernel_init=_init(0.01),
                        dtype=self.dtype)(y)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(y)
        else:
            y = _ConvBlock(self.features, norm=self.norm, dropout=self.dropout,
                           dtype=self.dtype)(x, train)
            y = _ConvBlock(self.features, norm=self.norm, relu=False,
                           dropout=self.dropout, dtype=self.dtype)(y, train)
        if x.shape[-1] != self.features:
            # channel-pad skip (Resnet_block_ds, DDFSeg.py:64-79)
            pad = (self.features - x.shape[-1]) // 2
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (pad, pad)))
        return nn.relu(y + x)


class _Attention(nn.Module):
    """SAGAN-style self-attention (DDFSeg.py:145-173); dropout 0.25 as
    constructed by ``encoders`` (DDFSeg.py:201, zero_rate pass-through)."""
    features: int
    dropout: float = 0.25
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        n, h, w, c = x.shape
        f = _ConvBlock(self.features // 8, kernel=1, dropout=self.dropout,
                       dtype=self.dtype, name="conv_f")(x, train)
        f = nn.max_pool(f, (2, 2), (2, 2))
        g = _ConvBlock(self.features // 8, kernel=1, dropout=self.dropout,
                       dtype=self.dtype, name="conv_g")(x, train)
        hmap = _ConvBlock(self.features // 2, kernel=1, dropout=self.dropout,
                          dtype=self.dtype, name="conv_h")(x, train)
        hmap = nn.max_pool(hmap, (2, 2), (2, 2))
        f2 = f.reshape(n, -1, self.features // 8)             # (N, HW/4, C/8)
        g2 = g.reshape(n, -1, self.features // 8)             # (N, HW, C/8)
        s = jnp.einsum("nmc,nkc->nmk", f2.astype(jnp.float32),
                       g2.astype(jnp.float32))                # (N, HW/4, HW)
        beta = jax.nn.softmax(s, axis=1)
        h2 = hmap.reshape(n, -1, self.features // 2)          # (N, HW/4, C/2)
        o = jnp.einsum("nmd,nmk->nkd", h2.astype(jnp.float32), beta)
        o = o.reshape(n, h, w, self.features // 2).astype(self.dtype)
        o = _ConvBlock(self.features, kernel=1, relu=False,
                       dropout=self.dropout, dtype=self.dtype,
                       name="conv_o")(o, train)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return gamma * o + x


class EncoderC(nn.Module):
    """Shared content encoder (DDFSeg.py:93-119): 3 -> 32f ch @ /8; built
    with zero_rate=None so NO dropout anywhere (DDFSeg.py:92-102)."""
    filters: int = 16
    slim: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.filters

        def res(feats):
            return _ResBlock(feats, dropout=0.0, dtype=self.dtype)

        x = _ConvBlock(f, kernel=7, dtype=self.dtype)(x.astype(self.dtype), train)
        x = res(f)(x, train)
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = res(2 * f)(x, train)
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = res(4 * f)(x, train)                   # combine: ds + plain
        if not self.slim:
            x = res(4 * f)(x, train)
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = res(8 * f)(x, train)                   # combine1
        if not self.slim:
            x = res(8 * f)(x, train)
            x = res(16 * f)(x, train)              # combine2
            x = res(16 * f)(x, train)
            x = res(16 * f)(x, train)              # res_block2
            x = res(16 * f)(x, train)              # res_block3
        else:
            x = res(16 * f)(x, train)
        x = res(32 * f)(x, train)                  # combine3
        if not self.slim:
            x = res(32 * f)(x, train)
        return x


class EncoderS(nn.Module):
    """Per-domain content refiner: dilated res blocks + attention
    (DDFSeg.py:194-209, zero_rate=0.25)."""
    filters: int = 16
    slim: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = 32 * self.filters
        x = _ResBlock(c, dilation=2, dtype=self.dtype)(x, train)
        if not self.slim:
            x = _ResBlock(c, dilation=2, dtype=self.dtype)(x, train)
        return _Attention(c, dropout=0.25, dtype=self.dtype)(x, train)


class EncoderDiff(nn.Module):
    """Per-domain style encoder -> 32ch (DDFSeg.py:212-237, zero_rate=0.25
    on every conv and res block)."""
    filters: int = 8
    slim: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.filters
        x = _ConvBlock(f, kernel=7, dropout=0.25,
                       dtype=self.dtype)(x.astype(self.dtype), train)
        x = _ResBlock(f, dtype=self.dtype)(x, train)
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = _ResBlock(2 * f, dtype=self.dtype)(x, train)
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = _ResBlock(4 * f, dtype=self.dtype)(x, train)
        if not self.slim:
            x = _ResBlock(4 * f, dtype=self.dtype)(x, train)
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = _ConvBlock(32, dropout=0.25, dtype=self.dtype)(x, train)
        x = _ConvBlock(32, dropout=0.25, dtype=self.dtype)(x, train)
        return x


class DecoderC(nn.Module):
    """Latent decoder: conv to 4*ngf (Ins, no dropout) + 4 Ins res blocks
    with dropout 0.25 (reference ``decoderc``, DDFSeg.py:253-270). The
    reference instantiates this twice per image path: once shared on the
    544-ch concat (DDFNet.decoderc) and once inside each image decoder
    (decodera.decoder_block, 4*ngf in)."""
    ngf: int = NGF
    n_res: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = _ConvBlock(self.ngf * 4, stddev=0.02, norm="ins",
                       dtype=self.dtype)(x, train)
        for _ in range(self.n_res):
            x = _ResBlock(self.ngf * 4, norm="ins", dropout=0.25,
                          dtype=self.dtype)(x, train)
        return x


class ImageDecoder(nn.Module):
    """decodera/decoderb: inner decoderc + deconvs -> 1ch image, skip-add +
    tanh (DDFSeg.py:273-292)."""
    skip: bool = True
    ngf: int = NGF
    n_res: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, img, train: bool = True):
        x = DecoderC(ngf=self.ngf, n_res=self.n_res, dtype=self.dtype)(x, train)
        for feats in (self.ngf * 2, self.ngf * 2, self.ngf):
            # torch ConvTranspose2d(k3, s2, padding=1, output_padding=1)
            # equals explicit low/high padding (1, 2) here (verified
            # numerically; flax "SAME" distributes the asymmetry differently)
            x = nn.ConvTranspose(feats, (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)),
                                 kernel_init=_init(0.02), dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
        x = _ConvBlock(1, kernel=7, stddev=0.02, norm="none", relu=False,
                       dtype=self.dtype)(x, train)
        if self.skip:
            x = x + img[..., 1:2].astype(x.dtype)
        return jnp.tanh(x)


class DDFNet(nn.Module):
    """Full disentanglement net with cross-domain swap + cycle recon
    (DDFSeg.py:295-345)."""
    filters: int = 16
    style_filters: int = 8
    ngf: int = NGF
    slim: bool = False
    dtype: Any = jnp.bfloat16

    def setup(self):
        n_res = 1 if self.slim else 4
        self.encoderc = EncoderC(filters=self.filters, slim=self.slim,
                                 dtype=self.dtype)
        self.encoders = EncoderS(filters=self.filters, slim=self.slim,
                                 dtype=self.dtype)
        self.encodert = EncoderS(filters=self.filters, slim=self.slim,
                                 dtype=self.dtype)
        self.style_encoder_s = EncoderDiff(filters=self.style_filters,
                                           slim=self.slim, dtype=self.dtype)
        self.style_encoder_t = EncoderDiff(filters=self.style_filters,
                                           slim=self.slim, dtype=self.dtype)
        # the SHARED latent decoder on the 544-ch concat (DDFNet.decoderc,
        # DDFSeg.py:306; applied in decoder_s/decoder_t, :315-319)
        self.dec_shared = DecoderC(ngf=self.ngf, n_res=n_res, dtype=self.dtype)
        self.decoders = ImageDecoder(skip=True, ngf=self.ngf, n_res=n_res,
                                     dtype=self.dtype)
        self.decodert = ImageDecoder(skip=True, ngf=self.ngf, n_res=n_res,
                                     dtype=self.dtype)

    def content_s(self, x, train=True):
        return self.encoders(self.encoderc(x, train), train)

    def content_t(self, x, train=True):
        return self.encodert(self.encoderc(x, train), train)

    def decoder_s(self, x, img, train=True):
        return self.decoders(self.dec_shared(x, train), img, train)

    def decoder_t(self, x, img, train=True):
        return self.decodert(self.dec_shared(x, train), img, train)

    def __call__(self, imgs, imgt, train: bool = True) -> Dict[str, Any]:
        content_s = self.content_s(imgs, train)
        content_t = self.content_t(imgt, train)
        style_s = self.style_encoder_s(imgs, train)
        style_t = self.style_encoder_t(imgt, train)
        style_s_from_t = self.style_encoder_s(imgt, train)  # should -> 0
        style_t_from_s = self.style_encoder_t(imgs, train)  # should -> 0

        fake_s_t = self.decoder_t(jnp.concatenate([content_s, style_t], -1),
                                  imgs, train)
        fake_t_s = self.decoder_s(jnp.concatenate([content_t, style_s], -1),
                                  imgt, train)
        fake_s_t3 = jnp.concatenate([fake_s_t] * 3, -1)
        fake_t_s3 = jnp.concatenate([fake_t_s] * 3, -1)

        recon_content_t = self.content_s(fake_t_s3, train)
        recon_style_s = self.style_encoder_s(fake_t_s3, train)
        recon_content_s = self.content_t(fake_s_t3, train)
        recon_style_t = self.style_encoder_t(fake_s_t3, train)

        recon_imgs = self.decoder_s(
            jnp.concatenate([recon_content_s, recon_style_s], -1), fake_s_t3,
            train)
        recon_imgt = self.decoder_t(
            jnp.concatenate([recon_content_t, recon_style_t], -1), fake_t_s3,
            train)
        return {
            "style_s_from_t": style_s_from_t, "style_t_from_s": style_t_from_s,
            "fake_img_s_t": fake_s_t, "fake_img_t_s": fake_t_s,
            "recon_imgs": recon_imgs, "recon_imgt": recon_imgt,
            "recon_content_s": recon_content_s, "content_t": content_t,
            "content_s": content_s,
        }


class SegDecoder(nn.Module):
    """512 -> n_class segmentation head (DDFSeg.py:348-374): conv (Ins,
    dropout 0.25) + 4 Ins res blocks (dropout 0.25) + 3 deconvs + 7x7
    class conv."""
    num_classes: int = 4
    ngf: int = NGF
    slim: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = _ConvBlock(self.ngf * 4, stddev=0.02, norm="ins", dropout=0.25,
                       dtype=self.dtype)(x.astype(self.dtype), train)
        for _ in range(1 if self.slim else 4):
            x = _ResBlock(self.ngf * 4, norm="ins", dropout=0.25,
                          dtype=self.dtype)(x, train)
        for feats in (self.ngf * 2, self.ngf * 2, self.ngf):
            # torch ConvTranspose2d(k3, s2, padding=1, output_padding=1)
            # equals explicit low/high padding (1, 2) here (verified
            # numerically; flax "SAME" distributes the asymmetry differently)
            x = nn.ConvTranspose(feats, (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)),
                                 kernel_init=_init(0.02), dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
        return _ConvBlock(self.num_classes, kernel=7, stddev=0.02, norm="none",
                          relu=False, dtype=self.dtype)(x, train)
