"""Device mesh + sharding helpers — the framework's entire "distributed
backend".

The reference reaches multi-device only through latent Lightning DDP/NCCL
plumbing (SURVEY.md 2.7: sync_dist main_baseline.py:342, rank_zero_only,
shipped config devices:1). Here data parallelism is first-class and
compiler-managed: one 1-D `data` mesh over the slice, batch dim sharded,
params replicated; XLA emits the gradient all-reduces over ICI. Multi-host
extends via jax.distributed.initialize() (DCN between hosts) with no code
changes here. No TP/PP/EP axes on purpose: the largest model is ~11M params
(SURVEY.md 2.7 — "do not build").
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of batched arrays with the batch axis sharded."""
    return jax.device_put(tree, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, datasets) across the mesh."""
    return jax.device_put(tree, replicated(mesh))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
