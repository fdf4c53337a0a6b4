"""Device mesh + sharding helpers.

The reference's entire distributed story is data parallelism over NCCL
(DDP + DistributedSampler + SyncBN + all-reduce, SURVEY.md §2.4). The TPU
equivalent is one ``jax.sharding.Mesh`` with the batch sharded over a
``'data'`` axis under ``jit``: XLA/GSPMD inserts the gradient all-reduces
(over ICI within a slice, DCN across slices) and BatchNorm statistics are
computed over the *global* batch, which is exactly SyncBatchNorm.

Model parameters are replicated; this model is ~150M params, so no TP/FSDP is
needed (matching the reference, which has none).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def create_mesh_for_batch(batch_size: int, axis: str = DATA_AXIS) -> Mesh:
    """Largest device prefix whose count divides ``batch_size`` (so small
    debug batches still run; production batches use every chip)."""
    devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.array(devices[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = DATA_AXIS):
    """Place every array in `tree` with its leading dim sharded over the mesh."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate_tree(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
