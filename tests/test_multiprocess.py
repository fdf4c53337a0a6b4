"""Real 2-process multihost execution on the CPU backend (VERDICT r2 item 3).

Spawns two genuine JAX processes (``jax.distributed.initialize`` over a
localhost coordinator), each with 4 virtual CPU devices: process-sharded
Loader feed -> ``jax.make_array_from_process_local_data`` global-batch
assembly -> one jitted DP train step over the 8-device global mesh ->
``process_allgather`` metric merge. Asserts the 2-process loss matches the
single-process equivalent on the same global batch — the semantics the
reference gets from DDP + DistributedSampler + SyncBatchNorm + all_reduce
(`/root/reference/train_stage1.py:107-118,427-437`, `utils/util.py:17-27`).

Self-skips only when the environment forbids the coordinator socket
(DIST_INIT_FAILED); any other worker failure is a real failure.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_step_matches_single_process(tmp_path):
    try:
        port = _free_port()
    except OSError:
        pytest.skip("environment forbids sockets")

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--coord", f"localhost:{port}",
             "--pid", str(pid), "--nprocs", "2", "--out", str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for rc, out, err in outs:
        if rc == 3 and "DIST_INIT_FAILED" in err:
            pytest.skip(f"jax.distributed.initialize unavailable here: {err.strip()[:200]}")
        assert rc == 0, f"worker failed (rc={rc}):\nstdout: {out}\nstderr: {err[-2000:]}"

    results = []
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.json") as f:
            results.append(json.load(f))

    # cluster shape: 2 processes x 4 local devices, 8-global batch
    for r in results:
        assert r["process_count"] == 2
        assert r["local_devices"] == 4
        assert r["global_devices"] == 8
        assert r["global_batch_dim"] == 8

    # both processes computed the SAME global step (replicated outputs)
    for key in ("loss", "l1", "l4", "l5"):
        assert results[0][key] == pytest.approx(results[1][key], rel=1e-5), key

    # single-process equivalent on the same global batch: concat the two
    # Loader shards in process order (= make_array_from_process_local_data's
    # assembly) and run the identical step on an 8-device single-process mesh
    import jax

    from tests import _mp_worker as W
    from tris_tpu.parallel.mesh import create_mesh, replicate_tree, shard_batch

    assert jax.device_count() == 8  # conftest's virtual CPU mesh
    locals_ = [W.local_first_batch(pid, 2) for pid in range(2)]
    global_batch = {
        k: np.concatenate([locals_[0][k], locals_[1][k]], axis=0) for k in locals_[0]
    }
    mesh = create_mesh()
    state, critic_vars, step = W.build_step()
    state = replicate_tree(mesh, state)
    critic_vars = replicate_tree(mesh, critic_vars)
    _, metrics = step(state, shard_batch(mesh, global_batch), critic_vars)
    for key in ("loss", "l1", "l4", "l5"):
        assert results[0][key] == pytest.approx(float(metrics[key]), rel=2e-4), key

    # metric allgather merged BOTH processes' counters, and matches a local
    # accumulation of the union
    from tris_tpu.eval.metrics import SegEvalAccumulator

    ref_acc = SegEvalAccumulator(with_boxes=False)
    for pid in range(2):
        for i, u, hit, hitm in W.metric_samples(pid):
            ref_acc.add_stats(i, u, hit, hitm)
    expect = ref_acc.results()
    for r in results:
        for k, v in expect.items():
            assert r["merged_metrics"][k] == pytest.approx(v, rel=1e-6), k
