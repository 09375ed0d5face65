"""RAIN: style randomization via a VAE over AdaIN statistics.

Flax re-design of reference model/RAIN.py: a VGG-19 encoder truncated at
relu4_1 with intermediate taps (RAIN.py:43-99,163-167), a mirror decoder
(RAIN.py:8-40), and a VAE over the style feature's channel statistics —
``fc_encoder`` maps the (mean, std) in R^1024 to a latent whose
reparameterized ``sampling = mean + noise * std`` (RAIN.py:229-230) is
decoded by ``fc_decoder`` back to statistics applied AdaIN-style to the
content features (utils_.py:197-218).

Training losses (RAIN.py:217-246): content MSE at relu4_1, 4-scale AdaIN
style stats MSE, KL of the latent, reconstruction MSE of the stats. The
reference's staged backward (fc nets step on lw*KL + rw*recon; decoder steps
on cw*content + sw*style with fc frozen — Pretrainer_RAIN.py:153-173) is
reproduced with a surgical ``stop_gradient`` on the reconstructed stats
entering AdaIN, which blocks exactly the decoder-loss -> fc-net paths.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import kaiming_init, upsample_nearest

Array = jax.Array


# ---------------------------------------------------------------------------
# AdaIN statistics helpers (reference utils_.py:178-249), NHWC
# ---------------------------------------------------------------------------
def calc_mean_std(feat: Array, eps: float = 1e-5) -> Tuple[Array, Array]:
    """Channel-wise mean/std keeping dims: (N, 1, 1, C)."""
    f = feat.astype(jnp.float32)
    mean = jnp.mean(f, axis=(1, 2), keepdims=True)
    var = jnp.var(f, axis=(1, 2), keepdims=True, ddof=1) + eps
    return mean, jnp.sqrt(var)


def calc_feat_mean_std(feat: Array, eps: float = 1e-5) -> Array:
    """(N, 2C): concat of channel means and stds (utils_.py:230-249)."""
    mean, std = calc_mean_std(feat, eps)
    return jnp.concatenate([mean[:, 0, 0, :], std[:, 0, 0, :]], axis=1)


def adain_with_noise(content_feat: Array, style_stats: Array) -> Array:
    """Re-normalize content features with decoded style statistics
    (utils_.py:197-218). content (N, H, W, C); style_stats (N, 2C)."""
    c = content_feat.shape[-1]
    style_mean = style_stats[:, :c][:, None, None, :]
    style_std = style_stats[:, c:][:, None, None, :]
    mean, std = calc_mean_std(content_feat)
    normalized = (content_feat.astype(jnp.float32) - mean) / std
    return normalized * style_std + style_mean


def _refl_conv(x, features, name, dtype):
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return nn.Conv(features, (3, 3), padding="VALID", kernel_init=kaiming_init,
                   dtype=dtype, name=name)(x)


class VGGEncoder(nn.Module):
    """VGG-19 through relu4_1, returning the four relu{1..4}_1 taps."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(3, (1, 1), kernel_init=kaiming_init, dtype=self.dtype,
                    name="conv0")(x)
        x = nn.relu(_refl_conv(x, 64, "conv1_1", self.dtype))
        r1 = x
        x = nn.relu(_refl_conv(x, 64, "conv1_2", self.dtype))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = nn.relu(_refl_conv(x, 128, "conv2_1", self.dtype))
        r2 = x
        x = nn.relu(_refl_conv(x, 128, "conv2_2", self.dtype))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = nn.relu(_refl_conv(x, 256, "conv3_1", self.dtype))
        r3 = x
        for i in (2, 3, 4):
            x = nn.relu(_refl_conv(x, 256, f"conv3_{i}", self.dtype))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = nn.relu(_refl_conv(x, 512, "conv4_1", self.dtype))
        r4 = x
        return r1, r2, r3, r4


class VGGDecoder(nn.Module):
    """Mirror decoder relu4_1 -> image (RAIN.py:8-40)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.relu(_refl_conv(x, 256, "d1", self.dtype))
        x = upsample_nearest(x)
        for i in range(3):
            x = nn.relu(_refl_conv(x, 256, f"d2_{i}", self.dtype))
        x = nn.relu(_refl_conv(x, 128, "d3", self.dtype))
        x = upsample_nearest(x)
        x = nn.relu(_refl_conv(x, 128, "d4", self.dtype))
        x = nn.relu(_refl_conv(x, 64, "d5", self.dtype))
        x = upsample_nearest(x)
        x = nn.relu(_refl_conv(x, 64, "d6", self.dtype))
        x = _refl_conv(x, 3, "d7", self.dtype)
        return x


class FCEncoder(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.relu(nn.Dense(1024, kernel_init=kaiming_init, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(1024, kernel_init=kaiming_init, dtype=self.dtype)(x))
        return nn.Dense(1024, kernel_init=kaiming_init, dtype=self.dtype)(x)


class FCDecoder(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.relu(nn.Dense(1024, kernel_init=kaiming_init, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(1024, kernel_init=kaiming_init, dtype=self.dtype)(x))
        return nn.Dense(1024, kernel_init=kaiming_init, dtype=self.dtype)(x)


class RAIN(nn.Module):
    """Full RAIN net. Call methods via ``apply(..., method=...)``:

      losses(content, style)           -> (loss_c, loss_s, loss_l, loss_r)
      style_transfer(content, style, sampling=None) -> (image, sampling)
      encode(x)                        -> relu4_1 features
    """
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = VGGEncoder(dtype=self.dtype)
        self.decoder = VGGDecoder(dtype=self.dtype)
        self.fc_encoder = FCEncoder(dtype=self.dtype)
        self.fc_decoder = FCDecoder(dtype=self.dtype)

    def encode(self, x):
        return self.encoder(x)[-1]

    def encode_with_intermediate(self, x):
        return self.encoder(x)

    def __call__(self, content, style):
        return self.losses(content, style)

    def losses(self, content, style):
        """Pretraining losses (RAIN.py:217-246); encoder features are
        stop-gradiented (the VGG is frozen in the reference)."""
        style_feats = [jax.lax.stop_gradient(f)
                       for f in self.encoder(style)]
        content_feat = jax.lax.stop_gradient(self.encoder(content)[-1])

        stats = calc_feat_mean_std(style_feats[-1])          # (N, 1024)
        inter = self.fc_encoder(stats)
        mean, std = inter[:, :512], inter[:, 512:]
        noise = jax.random.normal(self.make_rng("noise"), mean.shape, jnp.float32)
        sampling = mean + noise * std
        recons = self.fc_decoder(sampling)                   # (N, 1024)

        # decoder path sees stop_gradient(recons): reproduces the staged
        # backward (fc nets receive no gradient from loss_c/loss_s)
        t = adain_with_noise(content_feat, jax.lax.stop_gradient(recons))
        g_t = self.decoder(t)
        g_t_feats = self.encoder(g_t)

        mse = lambda a, b: jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
        loss_c = mse(g_t_feats[-1], jax.lax.stop_gradient(t))
        loss_s = 0.0
        for gf, sf in zip(g_t_feats, style_feats):
            gm, gs = calc_mean_std(gf)
            sm, ss = calc_mean_std(sf)
            loss_s = loss_s + mse(gm, sm) + mse(gs, ss)
        mean_sq, std_sq = mean * mean, std * std
        loss_l = 0.5 * jnp.mean(mean_sq + std_sq - jnp.log(std_sq + 1e-5) - 1.0)
        loss_r = mse(recons, jax.lax.stop_gradient(stats))
        return loss_c, loss_s, loss_l, loss_r

    def style_transfer(self, content, style,
                       sampling: Optional[Array] = None):
        """Stylize content with (possibly epsilon-updated) style sampling
        (RAIN.py:248-283). Encoders are stop-gradiented like the reference's
        no_grad block; gradients flow to ``sampling`` through fc_decoder ->
        AdaIN -> decoder, which is what the epsilon ascent needs."""
        content_feat = jax.lax.stop_gradient(self.encoder(content)[-1])
        if sampling is None:
            style_feat = jax.lax.stop_gradient(self.encoder(style)[-1])
            stats = calc_feat_mean_std(style_feat)
            inter = self.fc_encoder(stats)
            mean, std = inter[:, :512], inter[:, 512:]
            noise = jax.random.normal(self.make_rng("noise"), mean.shape,
                                      jnp.float32)
            sampling = mean + noise * std
        recons = self.fc_decoder(sampling)
        feat = adain_with_noise(content_feat, recons)
        return self.decoder(feat), sampling
