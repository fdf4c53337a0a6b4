"""Tensor-parallel sharding over a 2D (data, model) mesh.

The reference has no model parallelism (DDP only, SURVEY.md §2.4) and at
~150M params this model does not *need* it — but the framework supports it
the TPU way: parameters are annotated with `NamedSharding`s over a `'model'`
mesh axis and GSPMD inserts the all-gathers/reduce-scatters, instead of the
hand-written megatron-style layer splits a CUDA stack would use. Useful when
scaling the backbone (RN101+/ViT-L critics) past a chip's HBM, or to cut
per-chip optimizer memory.

Design choice: specs are derived from leaf SHAPE alone (not parameter path),
so the same rule maps `params`, the AdamW `mu`/`nu` moments, and the EMA
teacher identically — GSPMD only needs consistent annotations to propagate a
correct (and reasonable) layout through the jitted step:

- conv kernels [kh, kw, cin, cout]: shard cout  (output-channel parallel)
- matmul kernels [in, out]:         shard out, else in, else replicate
- embeddings [vocab, d]:            covered by the 2D rule (vocab % tp == 0)
- 1D/0D (biases, BN/LN, scalars):   replicated (tiny; avoids channel-stat
                                    mismatches with the psum-BN data axis)

Sequence/pipeline/expert parallelism are intentionally absent: L<=77 text and
no MoE/deep-stack structure give them nothing to shard (documented here so
the omission is a decision, not a gap).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tris_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"


def create_mesh_2d(dp: int, tp: int,
                   devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """[dp, tp] mesh with axes ('data', 'model'). The model axis is the
    fastest-varying (last) so its collectives ride neighbouring ICI links."""
    devices = list(devices) if devices is not None else jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {dp * tp} devices, "
                         f"have {len(devices)}")
    return Mesh(np.asarray(devices[: dp * tp]).reshape(dp, tp),
                (DATA_AXIS, MODEL_AXIS))


def training_mesh(batch_size: int, tp: int = 1) -> Mesh:
    """The training mesh for a given ``--tp``: the 1D data mesh when tp == 1
    (``create_mesh_for_batch`` semantics), else [device_count // tp, tp]."""
    if tp <= 1:
        from tris_tpu.parallel.mesh import create_mesh_for_batch

        return create_mesh_for_batch(batch_size)
    n = jax.device_count()
    if n % tp:
        raise ValueError(f"--tp {tp} does not divide device count {n}")
    dp = n // tp
    # batch_size is PER-PROCESS (create_mesh_for_batch semantics); the data
    # axis shards the assembled GLOBAL batch, so validate that — a 2-host
    # run with --tp 2 --batch_size 12 on 16 chips (dp=8, global batch 24)
    # is valid even though 12 % 8 != 0.
    global_batch = batch_size * jax.process_count()
    if global_batch % dp:
        raise ValueError(
            f"global batch {global_batch} (per-process batch_size {batch_size}"
            f" x {jax.process_count()} processes) must be divisible by the "
            f"data-parallel size {dp} (= {n} devices / tp {tp})")
    return create_mesh_2d(dp, tp)


def leaf_spec(x, tp: int) -> P:
    """Shape-based PartitionSpec for one parameter-like leaf (see module
    docstring for the rules)."""
    shape = getattr(x, "shape", ())
    if len(shape) >= 2 and shape[-1] % tp == 0 and shape[-1] >= 2 * tp:
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    if len(shape) >= 2 and shape[0] % tp == 0 and shape[0] >= 2 * tp:
        return P(*([MODEL_AXIS] + [None] * (len(shape) - 1)))
    return P()


def shard_tree(tree, mesh: Mesh):
    """device_put every leaf with its shape-derived sharding. Applied to the
    whole TrainState (params, batch_stats, optimizer moments, EMA copies,
    step counters) — shape-based rules keep all param-shaped trees aligned."""
    tp = mesh.shape[MODEL_AXIS]

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, leaf_spec(x, tp)))

    return jax.tree_util.tree_map(put, tree)
