"""Device-mesh data parallelism (TPU-native; the reference is single-GPU).

Replaces "no distributed anything" in the reference (SURVEY §2.8) with the
standard JAX SPMD recipe: a 2-D ``Mesh(('data', 'model'))``, batches sharded
over the ``data`` axis, train state replicated, and XLA inserting the
gradient all-reduce over ICI automatically. EMA class centroids live in the
replicated state, and because every chip computes centroids from its local
shard *inside* the same jitted step, the reduction that makes them identical
across chips rides the same compiled program (no hand-written collectives
needed at this parallelism level; the ``model`` axis is reserved for fsdp
sharding of larger backbones).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_axis: int = 1,
              axis_names=("data", "model")) -> Mesh:
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    devices = np.asarray(devices[:n]).reshape(n // model_axis, model_axis)
    return Mesh(devices, axis_names)


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Put numpy batch arrays on device, sharded batch-dim over 'data'."""
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape"):
            spec = P("data", *([None] * (np.ndim(v) - 1)))
            out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def replicate_state(state, mesh: Mesh):
    """Fully replicate the train-state PyTree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(state, sharding)


def data_parallel_step(step_fn, mesh: Mesh):
    """Wrap a jitted step with explicit shardings: state replicated, batch
    data-sharded, outputs replicated. XLA inserts the psum for gradients and
    batch-stat/centroid reductions."""
    repl = NamedSharding(mesh, P())

    def batch_sharding(batch):
        return {k: NamedSharding(mesh, P("data", *([None] * (v.ndim - 1))))
                for k, v in batch.items()}

    def wrapped(state, batch, sched):
        batch = {k: jax.device_put(np.asarray(v), s)
                 for (k, v), s in zip(batch.items(),
                                      batch_sharding(batch).values())}
        state = jax.device_put(state, repl) if _not_committed(state) else state
        return step_fn(state, batch, sched)

    return wrapped


def _not_committed(tree) -> bool:
    leaf = jax.tree.leaves(tree)[0]
    return not hasattr(leaf, "sharding")


def fsdp_shard_state(state, mesh: Mesh, min_size: int = 2 ** 16):
    """Shard large parameter/optimizer leaves over the reserved ``model``
    axis (fsdp-style; SURVEY §2.8 "a flag, not a rewrite"). A leaf is sharded
    along its largest axis divisible by the model-axis size; small leaves and
    indivisible leaves stay replicated. Works with plain jit: GSPMD inserts
    the all-gathers/reduce-scatters."""
    model_n = mesh.shape["model"]

    def spec_for(x):
        if not hasattr(x, "shape") or x.size < min_size or model_n == 1:
            return P()
        dims = list(x.shape)
        order = sorted(range(len(dims)), key=lambda i: -dims[i])
        for i in order:
            if dims[i] % model_n == 0 and dims[i] >= model_n:
                spec = [None] * len(dims)
                spec[i] = "model"
                return P(*spec)
        return P()

    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec_for(x)))
        if hasattr(x, "shape") else x, state)


def spatial_shard_batch(batch: Dict[str, Any], mesh: Mesh,
                        axis: str = "model") -> Dict[str, Any]:
    """Spatial partitioning (SP): shard the image height dim over ``axis``
    in addition to batch over 'data'. For the conv backbones GSPMD inserts
    the halo exchanges (and re-shards through the down/up-sampling stages)
    automatically, so a (data, model) mesh can split one image's rows across
    chips — the TPU answer to "the images don't fit one chip" that the
    single-GPU reference cannot express. NHWC images (B, H, W, C) shard
    P('data', axis); (B, H, W) label maps likewise."""
    out = {}
    n = mesh.shape[axis]
    for k, v in batch.items():
        if hasattr(v, "shape") and np.ndim(v) >= 3 and v.shape[1] % n == 0:
            spec = P("data", axis, *([None] * (np.ndim(v) - 2)))
        elif hasattr(v, "shape"):
            spec = P("data", *([None] * (np.ndim(v) - 1)))
        else:
            out[k] = v  # non-array metadata (e.g. name lists) pass through
            continue
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def make_multihost_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Multi-host input feeding: each process contributes its local shard of
    the global batch (jax.make_array_from_process_local_data over the 'data'
    axis). On a single host this reduces to shard_batch."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape"):
            spec = P("data", *([None] * (np.ndim(v) - 1)))
            out[k] = jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec), np.asarray(v))
    return out
