"""Shared model plumbing: output container, torch-style inits, norm layers.

All models are flax.linen, NHWC, and take a ``dtype`` for activations
(bfloat16 on TPU) while keeping parameters and norm statistics in float32.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class SegOutput(NamedTuple):
    """Uniform segmentor output (reference forward convention
    ``(pred, aux_or_bottleneck, decoder_features)`` — DRUNet.py:149-169,
    deeplabv2.py:120-136, segmentation_models.py:43-62)."""
    pred: Array                      # (N, H, W, C) main logits
    aux: Optional[Array]             # (N, H, W, C) aux logits (multilvl) or None
    dcdr_ft: Array                   # (N, H, W, F) decoder features (contrastive space)
    bottleneck: Optional[Array] = None  # encoder bottleneck features


# torch-default-ish initialisers -------------------------------------------
def conv_init(scale: float = 0.02):
    """N(0, scale) conv init used by the reference discriminators/classifiers
    (GAN.py:76-80, deeplabv2.py:92-96)."""
    def init(key, shape, dtype=jnp.float32):
        return scale * jax.random.normal(key, shape, dtype)
    return init


kaiming_init = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
# torch nn.Conv2d default: kaiming_uniform(a=sqrt(5)) == uniform fan_in scale 1/3
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class FrozenBatchNorm(nn.Module):
    """BatchNorm whose scale/bias receive no gradient (DeepLabV2 frozen-BN
    semantics, reference deeplabv2.py:16-29: affine params exist with
    requires_grad=False; batch statistics still used/updated in training).
    Implemented manually so stop_gradient can wrap the affine parameters."""
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        use_running = self.use_running_average or not train
        if use_running:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        inv = jax.lax.rsqrt(var + self.epsilon)
        scale = jax.lax.stop_gradient(scale)
        bias = jax.lax.stop_gradient(bias)
        y = (x.astype(jnp.float32) - mean) * inv * scale + bias
        return y.astype(self.dtype)


class ConvBNAct(nn.Module):
    """Conv -> activation -> optional BN (DRUNet block order, DRUNet.py:29-36
    puts BN *after* the activation) or Conv -> BN -> act (UNet order)."""
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    norm: bool = True
    bn_after_act: bool = True
    negative_slope: float = 0.01
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = self.dilation * (self.kernel // 2)
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=[(pad, pad), (pad, pad)],
                    use_bias=self.use_bias,
                    kernel_init=torch_conv_init,
                    dtype=self.dtype)(x)
        if self.bn_after_act:
            x = nn.leaky_relu(x, self.negative_slope)
            if self.norm:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype)(x)
        else:
            if self.norm:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


def max_pool(x, window: int = 2, stride: int = 2, padding="VALID"):
    return nn.max_pool(x, (window, window), (stride, stride), padding)


def upsample_nearest(x, factor: int = 2):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * factor, w * factor, c), method="nearest")


def upsample_bilinear(x, size, align_corners: bool = False):
    """Bilinear resize to ``size``.

    ``align_corners=False`` (half-pixel centers) matches torch
    ``F.interpolate(..., align_corners=False)`` and is jax.image.resize's
    native convention. ``align_corners=True`` reproduces the reference
    models' ``nn.Upsample(mode='bilinear', align_corners=True)`` exactly
    (deeplabv2.py:96, DRUNet.py:156, BCL_DeeplabV2.py:171) — implemented as
    two small interpolation-matrix matmuls (one-hot-weighted gathers as
    (H_out, H_in) operands), which XLA maps onto the MXU instead of the
    gather units; numerics are f32-accumulated."""
    n, h, w, c = x.shape
    H, W = size
    if not align_corners:
        return jax.image.resize(x, (n, H, W, c), method="bilinear")

    def interp_matrix(out_n: int, in_n: int):
        if out_n == 1 or in_n == 1:
            pos = jnp.zeros((out_n,), jnp.float32)
        else:
            pos = jnp.arange(out_n, dtype=jnp.float32) * ((in_n - 1) / (out_n - 1))
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_n - 1)
        hi = jnp.clip(lo + 1, 0, in_n - 1)
        frac = pos - lo.astype(jnp.float32)
        eye = jnp.eye(in_n, dtype=jnp.float32)
        return eye[lo] * (1.0 - frac)[:, None] + eye[hi] * frac[:, None]

    ay = interp_matrix(H, h)
    ax = interp_matrix(W, w)
    y = jnp.einsum("Oh,nhwc->nOwc", ay, x.astype(jnp.float32))
    y = jnp.einsum("Ow,nhwc->nhOc", ax, y)
    return y.astype(x.dtype)


def build_segmentor(cfg) -> nn.Module:
    """Backbone factory (reference Trainer_baseline.prepare_model:121-142)."""
    from .drunet import DRUNet
    from .unet import UNet
    from .deeplabv2 import DeepLabV2
    from .resnet_unet import ResNetUNet
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    name = cfg.backbone.lower()
    if name == "drunet":
        return DRUNet(filters=cfg.filters, n_block=cfg.n_block,
                      bottleneck_depth=cfg.bottleneck_depth,
                      n_class=cfg.num_classes, multilvl=cfg.multilvl,
                      phead=cfg.phead, dtype=dtype)
    if name == "unet":
        return UNet(n_class=cfg.num_classes, dtype=dtype)
    if name in ("deeplabv2", "resnet101"):
        return DeepLabV2(num_classes=cfg.num_classes, multi_level=cfg.multilvl,
                         dtype=dtype)
    if name in ("resnet50", "resnet50_unet"):
        kw = {}
        if getattr(cfg, "layers", ()):
            kw["layers"] = tuple(cfg.layers)
        if getattr(cfg, "base", 64) != 64:
            kw["base"] = cfg.base
        return ResNetUNet(num_classes=cfg.num_classes, multilvl=cfg.multilvl,
                          phead=cfg.phead, feat_dim=cfg.filters, dtype=dtype,
                          **kw)
    raise ValueError(f"unknown backbone {cfg.backbone!r}")
