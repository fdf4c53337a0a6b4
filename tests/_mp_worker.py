"""One JAX process of a 2-process CPU cluster for tests/test_multiprocess.py.

Executes the real multihost code path end-to-end — the TPU-native equivalent
of the reference's `--distributed` DDP run
(`/root/reference/train_stage1.py:107-118,427-437`):

- ``jax.distributed.initialize`` (the init_process_group('nccl') analogue)
- a per-process Loader shard (the DistributedSampler analogue)
- ``shard_batch`` / ``jax.make_array_from_process_local_data`` global-batch
  assembly
- one jitted DP train step over the global mesh (GSPMD gradient all-reduce =
  DDP; global-batch BN stats = SyncBatchNorm)
- ``SegEvalAccumulator.merge_across_processes`` (the dist.all_reduce metric
  merge, utils/util.py:17-27)

The step logic lives in module functions so the parent test can run the
single-process equivalent on the same data and compare losses/metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

N_EXAMPLES = 16
IMG_SIZE = 32
LOCAL_BATCH = 4  # per process; global batch = 4 * process_count


class SynthDS:
    """Deterministic synthetic train dataset (same on every process)."""

    eval_mode = False

    def __init__(self):
        rng = np.random.default_rng(123)
        self.images = rng.standard_normal((N_EXAMPLES, IMG_SIZE, IMG_SIZE, 3)).astype(np.float32)
        ids = np.zeros((N_EXAMPLES, 20), np.int32)
        ids[:, 0], ids[:, 1], ids[:, 2] = 49406, 786, 49407
        ids[:, 1] += np.arange(N_EXAMPLES, dtype=np.int32)  # distinct tokens
        self.ids = ids

    def __len__(self) -> int:
        return N_EXAMPLES

    def train_example(self, i: int, rng) -> dict:
        return {
            "image": self.images[i],
            "word_ids": self.ids[i],
            "neg_word_ids": np.stack([self.ids[(i + 1) % N_EXAMPLES],
                                      self.ids[(i + 2) % N_EXAMPLES]]),
        }


def local_first_batch(process_index: int, process_count: int) -> dict:
    """The first epoch-0 batch of this process's Loader shard."""
    from tris_tpu.data.dataset import Loader

    loader = Loader(SynthDS(), batch_size=LOCAL_BATCH, shuffle=True, seed=7,
                    num_threads=1, process_index=process_index,
                    process_count=process_count)
    return next(iter(loader.epoch(0)))


def build_step():
    """(model, critic, state, critic_vars, step_fn) with deterministic init."""
    import jax
    import jax.numpy as jnp

    from tests.helpers import TINY_RESNET_CLIP, TINY_VIT_CLIP
    from tris_tpu.models.clip import CLIP
    from tris_tpu.models.stage1 import Stage1Config, TRISStage1
    from tris_tpu.train.stage1 import make_train_step
    from tris_tpu.train.state import create_train_state

    model = TRISStage1(Stage1Config(hidden_dim=32, clip_override=TINY_RESNET_CLIP))
    critic = CLIP(TINY_VIT_CLIP)
    img = jnp.zeros((1, IMG_SIZE, IMG_SIZE, 3), jnp.float32)
    ids = jnp.zeros((1, 20), jnp.int32).at[:, 0].set(49406).at[:, 2].set(49407)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, img, ids, train=True)
    critic_vars = critic.init(key, jnp.zeros((1, 64, 64, 3)), ids)
    state = create_train_state(model, variables, total_steps=100)
    step = make_train_step(model, critic, donate=False)
    return state, critic_vars, step


def metric_samples(process_index: int) -> list:
    """Deterministic per-process (I, U, hit, hitm) metric contributions."""
    rng = np.random.default_rng(1000 + process_index)
    out = []
    for _ in range(5):
        u = float(rng.integers(50, 100))
        i = float(rng.integers(0, 50))
        out.append((i, u, float(rng.integers(0, 2)), float(rng.integers(0, 2))))
    return out


def run(process_index: int, process_count: int) -> dict:
    """Shard the Loader, assemble the global batch, run one DP train step,
    merge metrics across processes. Returns the comparison payload."""
    import jax

    from tris_tpu.eval.metrics import SegEvalAccumulator
    from tris_tpu.parallel.mesh import create_mesh, replicate_tree, shard_batch

    mesh = create_mesh()
    state, critic_vars, step = build_step()
    state = replicate_tree(mesh, state)
    critic_vars = replicate_tree(mesh, critic_vars)

    local = local_first_batch(process_index, process_count)
    global_batch = shard_batch(mesh, local)
    new_state, metrics = step(state, global_batch, critic_vars)

    acc = SegEvalAccumulator(with_boxes=False)
    for i, u, hit, hitm in metric_samples(process_index):
        acc.add_stats(i, u, hit, hitm)
    merged = acc.merge_across_processes(force=True).results()

    return {
        "process_index": process_index,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "global_batch_dim": int(global_batch["image"].shape[0]),
        "loss": float(metrics["loss"]),
        "l1": float(metrics["l1"]),
        "l4": float(metrics["l4"]),
        "l5": float(metrics["l5"]),
        "merged_metrics": {k: float(v) for k, v in merged.items()},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    # match the parent suite's conftest so losses compare exactly
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        jax.distributed.initialize(
            coordinator_address=args.coord,
            num_processes=args.nprocs,
            process_id=args.pid,
        )
    except Exception as e:  # surfaced to the parent for skip-vs-fail triage
        print(f"DIST_INIT_FAILED: {e!r}", file=sys.stderr)
        sys.exit(3)

    result = run(args.pid, args.nprocs)
    with open(os.path.join(args.out, f"result_{args.pid}.json"), "w") as f:
        json.dump(result, f)
    print(f"worker {args.pid} done: loss={result['loss']:.6f}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
