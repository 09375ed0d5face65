"""PointNet classifier — AdaptEvery's point-cloud discriminator.

Flax re-design of reference model/PointNetCls.py: STN3d/STNkd transform nets
(:11-106), PointNetfeat global feature extractor (:107-174), PointNetCls
head returning (logits, trans, trans_feat) (:175-222), and the feature
transform regulariser (:224-238). Points are (N, P, D) (channel-last; the
reference is (N, D, P)).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import torch_conv_init as _init


class _MLP1d(nn.Module):
    """Pointwise Conv1d + BN + ReLU (applied per point)."""
    features: int
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Dense(self.features, kernel_init=_init, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x) if self.relu else x


class STN(nn.Module):
    """Spatial/feature transform net -> (N, k, k) matrix (PointNetCls:11-106)."""
    k: int = 3
    base: int = 64  # width knob; 64 is reference-exact
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        # x: (N, P, k)
        b = self.base
        y = _MLP1d(b, dtype=self.dtype)(x, train)
        y = _MLP1d(b * 2, dtype=self.dtype)(y, train)
        y = _MLP1d(b * 16, dtype=self.dtype)(y, train)
        y = jnp.max(y, axis=1)                        # (N, 16b)
        y = _MLP1d(b * 8, dtype=self.dtype)(y, train)
        y = _MLP1d(b * 4, dtype=self.dtype)(y, train)
        y = nn.Dense(self.k * self.k, kernel_init=nn.initializers.zeros,
                     dtype=self.dtype)(y)
        iden = jnp.eye(self.k, dtype=y.dtype).reshape(1, -1)
        return (y + iden).reshape(-1, self.k, self.k)


class PointNetFeat(nn.Module):
    global_feat: bool = True
    feature_transform: bool = False
    base: int = 64  # width knob; 64 is reference-exact
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        b = self.base
        trans = STN(k=x.shape[-1], base=b, dtype=self.dtype,
                    name="stn")(x, train)
        x = jnp.einsum("npd,nde->npe", x, trans)
        x = _MLP1d(b, dtype=self.dtype)(x, train)
        trans_feat = None
        if self.feature_transform:
            trans_feat = STN(k=b, base=b, dtype=self.dtype,
                             name="fstn")(x, train)
            x = jnp.einsum("npd,nde->npe", x, trans_feat)
        point_feat = x
        x = _MLP1d(b * 2, dtype=self.dtype)(x, train)
        x = _MLP1d(b * 16, relu=False, dtype=self.dtype)(x, train)
        x = jnp.max(x, axis=1)                         # (N, 16b)
        if self.global_feat:
            return x, trans, trans_feat
        rep = jnp.broadcast_to(x[:, None, :],
                               (x.shape[0], point_feat.shape[1], b * 16))
        return jnp.concatenate([point_feat, rep], axis=-1), trans, trans_feat


class PointNetCls(nn.Module):
    k: int = 2
    feature_transform: bool = False
    base: int = 64  # width knob; 64 is reference-exact
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True) -> Tuple:
        feat, trans, trans_feat = PointNetFeat(
            global_feat=True, feature_transform=self.feature_transform,
            base=self.base, dtype=self.dtype, name="feat")(x, train)
        y = _MLP1d(self.base * 8, dtype=self.dtype)(feat, train)
        y = nn.Dropout(0.3, deterministic=not train)(y)
        y = _MLP1d(self.base * 4, dtype=self.dtype)(y, train)
        y = nn.Dense(self.k, kernel_init=_init, dtype=self.dtype)(y)
        return y, trans, trans_feat


def feature_transform_regularizer(trans: jax.Array) -> jax.Array:
    """||I - A A^T||^2 mean (PointNetCls.py:224-238)."""
    d = trans.shape[1]
    eye = jnp.eye(d, dtype=jnp.float32)
    prod = jnp.einsum("nij,nkj->nik", trans.astype(jnp.float32),
                      trans.astype(jnp.float32))
    return jnp.mean(jnp.linalg.norm(eye[None] - prod, axis=(1, 2)))
