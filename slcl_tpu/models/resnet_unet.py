"""ResNet-50 encoder U-Net — the `smp.Unet('resnet50')` equivalent.

The reference wraps segmentation_models_pytorch with decoder channels
(256, 128, 64, 32, 16) (reference model/segmentation_models.py:26-33) but its
Kaggle edit returns the *logits* as the decoder-feature tap
(segmentation_models.py:55-62), which shape-mismatches the (4, 32)
class-center files. Documented repair (SURVEY §2.3): this rebuild returns the
true pre-head decoder features and, when ``feat_dim`` differs from the last
decoder channel count, projects them with a 1x1 conv so the contrastive
feature space matches the configured center dimensionality (default 32).

Encoder: standard ResNet-50 (trainable BN — smp encoders are not frozen).
Decoder: 5 U-Net blocks, nearest-2x upsample + skip concat + double
conv-BN-ReLU. ``multilvl`` adds an aux classifier on the 32-ch half-res
decoder stage (the reference wrapper had no aux head; the MPSCL recipe
disables the aux loss — Trainer_MPSCL.py:128-130).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import ConvBNAct, SegOutput, torch_conv_init, upsample_bilinear, upsample_nearest

_INIT = torch_conv_init


class _BNReLUConv(nn.Module):
    features: int
    stride: int = 1
    kernel: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    kernel_init=_INIT, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, kernel_init=_INIT,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, kernel_init=_INIT,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, kernel_init=_INIT,
                    dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=_INIT,
                               dtype=self.dtype, name="down_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    name="down_bn")(residual)
        return nn.relu(y + residual)


class _DecoderBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip, train: bool = True):
        x = upsample_nearest(x)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = _BNReLUConv(self.out_ch, dtype=self.dtype, name="conv1")(x, train)
        x = _BNReLUConv(self.out_ch, dtype=self.dtype, name="conv2")(x, train)
        return x


class ResNetUNet(nn.Module):
    num_classes: int = 4
    layers: Sequence[int] = (3, 4, 6, 3)      # ResNet-50
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    multilvl: bool = False
    phead: bool = False
    feat_dim: int = 32
    base: int = 64     # stem/stage-1 planes; stages double (CI/dryrun knob —
    #                    64 is reference-exact, smaller values only shrink)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True) -> SegOutput:
        in_size = x.shape[1:3]
        x = x.astype(self.dtype)
        # stem
        c1 = nn.Conv(self.base, (7, 7), strides=(2, 2),
                     padding=[(3, 3), (3, 3)],
                     use_bias=False, kernel_init=_INIT, dtype=self.dtype,
                     name="conv1")(x)
        c1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype, name="bn1")(c1)
        c1 = nn.relu(c1)                                    # (H/2, 64)
        p = jnp.pad(c1, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        p = nn.max_pool(p, (3, 3), (2, 2), "VALID")         # (H/4, 64)

        def stage(x, planes, blocks, stride, name):
            x = _Bottleneck(planes, stride=stride, downsample=True,
                            dtype=self.dtype, name=f"{name}_0")(x, train)
            for i in range(1, blocks):
                x = _Bottleneck(planes, dtype=self.dtype,
                                name=f"{name}_{i}")(x, train)
            return x

        b = self.base
        l1 = stage(p, b, self.layers[0], 1, "layer1")        # (H/4, 4b)
        l2 = stage(l1, b * 2, self.layers[1], 2, "layer2")   # (H/8, 8b)
        l3 = stage(l2, b * 4, self.layers[2], 2, "layer3")   # (H/16, 16b)
        l4 = stage(l3, b * 8, self.layers[3], 2, "layer4")   # (H/32, 32b)

        skips = [l3, l2, l1, c1, None]
        y = l4
        feats = []
        for i, (ch, skip) in enumerate(zip(self.decoder_channels, skips)):
            y = _DecoderBlock(ch, dtype=self.dtype,
                              name=f"decoder_{i}")(y, skip, train)
            feats.append(y)

        pred = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                       kernel_init=_INIT, dtype=self.dtype, name="seg_head")(y)

        aux: Optional[jnp.ndarray] = None
        if self.multilvl:
            aux = nn.Conv(self.num_classes, (1, 1), kernel_init=_INIT,
                          dtype=self.dtype, name="aux_head")(feats[-2])
            aux = upsample_bilinear(aux, in_size, align_corners=True)

        dcdr_ft = y
        if self.feat_dim and self.feat_dim != self.decoder_channels[-1]:
            dcdr_ft = nn.Conv(self.feat_dim, (1, 1), kernel_init=_INIT,
                              dtype=self.dtype, name="feat_proj")(y)
        if self.phead:
            h = nn.Conv(self.feat_dim * 2, (1, 1), kernel_init=_INIT,
                        dtype=self.dtype, name="phead1")(dcdr_ft)
            h = nn.relu(h)
            dcdr_ft = nn.Conv(self.feat_dim, (1, 1), kernel_init=_INIT,
                              dtype=self.dtype, name="phead2")(h)

        return SegOutput(pred=pred, aux=aux, dcdr_ft=dcdr_ft, bottleneck=l4)


class ResNetUNetPoint(nn.Module):
    """AdaptEvery's segmentor: ResNet-UNet + a point-cloud regression head.

    The reference wraps ``segmentation_model_point`` (reference
    model/segmentation_models.py:71-93, a Kaggle-stubbed smp variant whose
    intent — per Trainer_AdaptEvery.py:229-257 — is a third output
    ``pred_vert (N, n_points, 3)`` regressing the label point cloud,
    trained with Chamfer loss and discriminated by PointNetCls). Here the
    point head is a small conv+pool+dense stack on the encoder bottleneck.
    """
    num_classes: int = 4
    n_points: int = 300
    multilvl: bool = True
    layers: Sequence[int] = (3, 4, 6, 3)  # ResNet-50; override for CI/dryrun
    base: int = 64                        # width knob (see ResNetUNet.base)
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = ResNetUNet(num_classes=self.num_classes, layers=self.layers,
                         multilvl=self.multilvl, base=self.base,
                         decoder_channels=self.decoder_channels,
                         dtype=self.dtype, name="unet")(x, train)
        h = nn.Conv(self.base * 4, (3, 3), strides=(2, 2),
                    padding=[(1, 1), (1, 1)],
                    kernel_init=_INIT, dtype=self.dtype,
                    name="point_conv")(out.bottleneck)
        h = nn.relu(h)
        h = jnp.mean(h, axis=(1, 2))                      # global average pool
        h = nn.relu(nn.Dense(self.base * 8, kernel_init=_INIT,
                             dtype=self.dtype, name="point_fc1")(h))
        v = nn.Dense(self.n_points * 3, kernel_init=_INIT, dtype=self.dtype,
                     name="point_fc2")(h)
        vert = v.reshape(-1, self.n_points, 3)
        return out, vert
