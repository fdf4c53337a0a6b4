"""Device mesh + sharding helpers.

The reference's entire distributed story is data parallelism over NCCL
(DDP + DistributedSampler + SyncBN + all-reduce, SURVEY.md §2.4). The TPU
equivalent is one ``jax.sharding.Mesh`` with the batch sharded over a
``'data'`` axis under ``jit``: XLA/GSPMD inserts the gradient all-reduces
(over ICI within a slice, DCN across slices) and BatchNorm statistics are
computed over the *global* batch, which is exactly SyncBatchNorm.

Model parameters are replicated; this model is ~150M params, so no TP/FSDP is
needed (matching the reference, which has none).

Batch semantics (multihost): ``batch_size`` flags are PER-PROCESS, matching
the reference's DDP convention (torch DataLoader batch_size per rank under
DistributedSampler, train_stage1.py:107-118). The global batch under ``jit``
is ``batch_size * jax.process_count()``; each process feeds its local shard
and :func:`shard_batch` assembles the global array via
``jax.make_array_from_process_local_data``.
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
    """Mesh sized to the batch. ``batch_size`` is the PER-PROCESS batch; the
    global batch is ``batch_size * process_count``.

    Single-process: largest device prefix whose count divides ``batch_size``
    (so small debug batches still run; production batches use every chip).
    Multi-process: every process must use all its devices (a mesh must cover
    all addressable devices of each participating process), so the local
    batch must divide evenly instead.
    """
    devices = jax.devices()
    if jax.process_count() > 1:
        local = jax.local_device_count()
        if batch_size % local != 0:
            raise ValueError(
                f"per-process batch_size={batch_size} must be divisible by "
                f"local device count {local} in a multihost run"
            )
        return Mesh(np.array(devices), (axis,))
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.array(devices[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_put(mesh: Mesh, axis: str = DATA_AXIS):
    """Per-array host->device put that shards the leading (batch) dim over the
    mesh. In a multi-process run each process passes its LOCAL shard and the
    global array has leading dim ``local * process_count``
    (`jax.make_array_from_process_local_data`, the jax.Array replacement for
    per-rank DDP batches). Single-process it is equivalent to a device_put.
    """
    sharding = batch_sharding(mesh, axis)

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return put


def shard_batch(mesh: Mesh, tree, axis: str = DATA_AXIS):
    """Assemble each process's local batch into a global batch-sharded array
    (see :func:`make_put` for the per-array semantics)."""
    return jax.tree_util.tree_map(make_put(mesh, axis), tree)


def replicate_tree(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
