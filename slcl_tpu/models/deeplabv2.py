"""DeepLab-V2: dilated ResNet-101 + ASPP heads, frozen BatchNorm.

Flax re-design of reference model/deeplabv2.py: ResNet bottleneck stacks
(layers 3/4 dilated 2/4 with stride 1, stride carried by the first 1x1 conv
as in the reference's "change" variant, deeplabv2.py:15), frozen-affine BN
(deeplabv2.py:16-29), ASPP ``ClassifierModule`` = sum of four 3x3 convs with
dilations (6, 12, 18, 24) (deeplabv2.py:52-68), optional aux head on layer3
(multi_level, deeplabv2.py:87-88), outputs bilinearly upsampled to input size
(align_corners=True semantics approximated by jax.image bilinear). Returns
``SegOutput(pred, aux, layer4_features)`` — 42.9 M params oracle at
deeplabv2.py:224.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import FrozenBatchNorm, SegOutput, conv_init, upsample_bilinear

_INIT = conv_init(0.01)  # reference deeplabv2.py:92-93: N(0, 0.01) convs


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        y = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, kernel_init=_INIT, dtype=self.dtype,
                    name="conv1")(x)
        y = FrozenBatchNorm(dtype=self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        d = self.dilation
        y = nn.Conv(self.planes, (3, 3), padding=[(d, d), (d, d)],
                    kernel_dilation=(d, d), use_bias=False, kernel_init=_INIT,
                    dtype=self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(dtype=self.dtype, name="bn2")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, kernel_init=_INIT,
                    dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(dtype=self.dtype, name="bn3")(y, train)
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=_INIT,
                               dtype=self.dtype, name="down_conv")(x)
            residual = FrozenBatchNorm(dtype=self.dtype, name="down_bn")(
                residual, train)
        return nn.relu(y + residual)


class _ASPP(nn.Module):
    """Sum of four dilated 3x3 class convs (deeplabv2.py:52-68)."""
    num_classes: int
    dilations: Sequence[int] = (6, 12, 18, 24)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        out = None
        for i, d in enumerate(self.dilations):
            y = nn.Conv(self.num_classes, (3, 3), padding=[(d, d), (d, d)],
                        kernel_dilation=(d, d), use_bias=True,
                        kernel_init=_INIT, dtype=self.dtype,
                        name=f"aspp{i}")(x)
            out = y if out is None else out + y
        return out


class _ASPPWithFeature(nn.Module):
    """ASPP that also returns the concatenated branch activations — the
    76-ch 'feature' space BCL's prototypes live in (reference
    BCL_DeeplabV2.py:86-97)."""
    num_classes: int
    dilations: Sequence[int] = (6, 12, 18, 24)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        out, feats = None, []
        for i, d in enumerate(self.dilations):
            y = nn.Conv(self.num_classes, (3, 3), padding=[(d, d), (d, d)],
                        kernel_dilation=(d, d), use_bias=True,
                        kernel_init=_INIT, dtype=self.dtype,
                        name=f"aspp{i}")(x)
            feats.append(y)
            out = y if out is None else out + y
        return out, jnp.concatenate(feats, axis=-1)


class BCLDeepLab(nn.Module):
    """ResNetPair5 equivalent (reference model/BCL_DeeplabV2.py:100-177):
    dilated ResNet-101 + single feature-returning ASPP head; forward returns
    ``(upsampled logits, pre-classifier ASPP features)``. The ``pair``
    variant (ResNetPair5_withT, :180-253) adds a separate target-domain stem
    (conv1/bn1/layer1) selected by ``source``."""
    num_classes: int = 19
    layers: Sequence[int] = (3, 4, 23, 3)
    pair: bool = False
    base: int = 64   # stage width knob; 64 is reference-exact (ResNet-101)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True, source: bool = True):
        in_size = x.shape[1:3]
        x = x.astype(self.dtype)

        def stem(x, prefix):
            x = nn.Conv(self.base, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)],
                        use_bias=False, kernel_init=_INIT, dtype=self.dtype,
                        name=f"{prefix}conv1")(x)
            x = FrozenBatchNorm(dtype=self.dtype, name=f"{prefix}bn1")(x, train)
            x = nn.relu(x)
            x = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)),
                        constant_values=-jnp.inf)
            return nn.max_pool(x, (3, 3), (2, 2), "VALID")

        def stage(x, planes, blocks, stride, dilation, name):
            x = _Bottleneck(planes, stride=stride, dilation=dilation,
                            downsample=True, dtype=self.dtype,
                            name=f"{name}_0")(x, train)
            for i in range(1, blocks):
                x = _Bottleneck(planes, dilation=dilation, dtype=self.dtype,
                                name=f"{name}_{i}")(x, train)
            return x

        # ``source`` is static; both stems must exist in the param tree, so
        # the unused one is still traced at init time
        x_src = x_tgt = None
        b = self.base
        if (not self.pair) or source or self.is_initializing():
            x_src = stage(stem(x, ""), b, self.layers[0], 1, 1, "layer1")
        if self.pair and ((not source) or self.is_initializing()):
            x_tgt = stage(stem(x, "target_"), b, self.layers[0], 1, 1,
                          "target_layer1")
        x = x_src if ((not self.pair) or source) else x_tgt
        x = stage(x, 2 * b, self.layers[1], 2, 1, "layer2")
        x = stage(x, 4 * b, self.layers[2], 1, 2, "layer3")
        x = stage(x, 8 * b, self.layers[3], 1, 4, "layer4")
        pred, feature = _ASPPWithFeature(self.num_classes, dtype=self.dtype,
                                         name="layer5")(x)
        pred = upsample_bilinear(pred, in_size, align_corners=True)
        return pred, feature


class DeepLabV2(nn.Module):
    num_classes: int = 4
    layers: Sequence[int] = (3, 4, 23, 3)   # ResNet-101
    multi_level: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True) -> SegOutput:
        in_size = x.shape[1:3]
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=_INIT, dtype=self.dtype,
                    name="conv1")(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        # torch MaxPool2d(3, 2, padding=1, ceil_mode=True): pad (1, 2) + VALID
        x = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), (2, 2), "VALID")

        def stage(x, planes, blocks, stride, dilation, name):
            x = _Bottleneck(planes, stride=stride, dilation=dilation,
                            downsample=True, dtype=self.dtype,
                            name=f"{name}_0")(x, train)
            for i in range(1, blocks):
                x = _Bottleneck(planes, dilation=dilation, dtype=self.dtype,
                                name=f"{name}_{i}")(x, train)
            return x

        x = stage(x, 64, self.layers[0], 1, 1, "layer1")
        x = stage(x, 128, self.layers[1], 2, 1, "layer2")
        x3 = stage(x, 256, self.layers[2], 1, 2, "layer3")
        x4 = stage(x3, 512, self.layers[3], 1, 4, "layer4")

        aux: Optional[jnp.ndarray] = None
        if self.multi_level:
            aux = _ASPP(self.num_classes, dtype=self.dtype, name="layer5")(x3)
            aux = upsample_bilinear(aux, in_size, align_corners=True)
        pred = _ASPP(self.num_classes, dtype=self.dtype, name="layer6")(x4)
        pred = upsample_bilinear(pred, in_size, align_corners=True)
        return SegOutput(pred=pred, aux=aux, dcdr_ft=x4, bottleneck=x4)
