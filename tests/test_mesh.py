"""Mesh / multihost input-feed tests (VERDICT r1 item 5).

Multi-process behavior can't be spawned inside the suite, but the shared code
path — ``jax.make_array_from_process_local_data`` assembly plus the
cross-process metric allgather — is exercised single-process here; the
multi-process recipe is documented in docs/MULTIHOST.md.
Reference semantics being modeled: DistributedSampler + per-rank DataLoader
batches (/root/reference/train_stage1.py:107-118).
"""

import jax
import numpy as np
import pytest

from tris_tpu.data.dataset import Loader
from tris_tpu.eval.metrics import SegEvalAccumulator
from tris_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    create_mesh_for_batch,
    shard_batch,
)


def test_shard_batch_assembles_global_array():
    mesh = create_mesh()
    n = mesh.devices.size
    batch = {
        "image": np.arange(n * 2 * 4 * 4 * 3, dtype=np.float32).reshape(n * 2, 4, 4, 3),
        "word_ids": np.arange(n * 2 * 20, dtype=np.int32).reshape(n * 2, 20),
    }
    out = shard_batch(mesh, batch)
    for k in batch:
        assert out[k].shape == batch[k].shape
        assert out[k].sharding == batch_sharding(mesh)
        np.testing.assert_array_equal(np.asarray(out[k]), batch[k])
    # leading dim actually split across devices
    shard_sizes = {s.data.shape[0] for s in out["image"].addressable_shards}
    assert shard_sizes == {2}


def test_create_mesh_for_batch_shrinks_to_divisor():
    mesh = create_mesh_for_batch(6)  # 8 devices, batch 6 -> 6-device mesh
    assert 6 % mesh.devices.size == 0
    full = create_mesh_for_batch(16)
    assert full.devices.size == jax.device_count()


def test_process_sharded_loader_partitions_dataset():
    """Every sample goes to exactly one process; per-process batch sizes equal."""

    class _DS:
        eval_mode = True

        def __len__(self):
            return 32

        def eval_example(self, i):
            return {"idx": np.array([i])}

    seen = []
    for p in range(4):
        loader = Loader(_DS(), batch_size=2, shuffle=True, seed=7, num_threads=1,
                        process_index=p, process_count=4)
        for batch in loader.epoch(epoch=3):
            assert batch["idx"].shape[0] == 2
            seen.extend(batch["idx"][:, 0].tolist())
    assert sorted(seen) == list(range(32))


def test_metric_allgather_path_single_process():
    """Force the process_allgather merge even with one process: counters must
    be unchanged (sum over a single participant)."""
    acc = SegEvalAccumulator(with_boxes=False)
    target = np.zeros((8, 8), np.uint8)
    target[2:6, 2:6] = 1
    pred = np.zeros((8, 8), np.float32)
    pred[2:6, 2:7] = 1.0
    acc.add(target, pred, cam=pred, gt_box=np.array([2.0, 2.0, 6.0, 6.0]))
    before = acc.results()
    acc.merge_across_processes(force=True)
    after = acc.results()
    assert before == after


# ---------------------------------------------------------------------------
# tensor parallelism (parallel/tp.py): 2D (data, model) mesh
# ---------------------------------------------------------------------------

def _tiny_stage1():
    import jax.numpy as jnp

    from tris_tpu.models.clip import CLIP, CLIPConfig
    from tris_tpu.models.stage1 import Stage1Config, TRISStage1

    tiny_rn = CLIPConfig(
        embed_dim=64, image_resolution=64, vision_layers=(1, 1, 1, 1), vision_width=16,
        vision_patch_size=None, transformer_width=32, transformer_heads=4,
        transformer_layers=2, txt_length=20,
    )
    tiny_vit = CLIPConfig(
        embed_dim=64, image_resolution=64, vision_layers=2, vision_width=64,
        vision_patch_size=16, transformer_width=32, transformer_heads=4,
        transformer_layers=2, txt_length=20,
    )
    return TRISStage1(Stage1Config(hidden_dim=32, clip_override=tiny_rn)), CLIP(tiny_vit)


def _tokens(batch):
    ids = np.zeros((batch, 20), np.int32)
    ids[:, 0], ids[:, 1], ids[:, 2] = 49406, 786, 49407
    return ids


def test_tp_leaf_spec_rules():
    from jax.sharding import PartitionSpec as P

    from tris_tpu.parallel.tp import leaf_spec

    conv = np.zeros((3, 3, 16, 64))
    assert leaf_spec(conv, 4) == P(None, None, None, "model")
    dense = np.zeros((32, 128))
    assert leaf_spec(dense, 4) == P(None, "model")
    odd_out = np.zeros((128, 30))  # out not divisible -> shard in
    assert leaf_spec(odd_out, 4) == P("model", None)
    bias = np.zeros((64,))
    assert leaf_spec(bias, 4) == P()
    scalar = np.zeros(())
    assert leaf_spec(scalar, 4) == P()


def test_training_mesh_tp_validates_global_batch(monkeypatch):
    """batch_size is PER-PROCESS: a 2-process run whose per-process batch
    does not divide the global dp size, but whose GLOBAL batch does, must be
    accepted (e.g. 2 hosts x 8 devices, tp=2 -> dp=8, batch 12 -> global 24)."""
    import jax

    import tris_tpu.parallel.tp as tp

    monkeypatch.setattr(jax, "device_count", lambda: 16)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    # don't build the (unbuildable, 16 > 8 devices) mesh — just validation
    monkeypatch.setattr(tp, "create_mesh_2d", lambda dp, t: ("mesh", dp, t))
    assert tp.training_mesh(12, tp=2) == ("mesh", 8, 2)

    with pytest.raises(ValueError, match="global batch"):
        tp.training_mesh(13, tp=2)  # global 26 % dp 8 != 0


def test_tp_train_step_matches_single_device():
    """One stage-1 train step on a (dp=2, tp=4) mesh == the unsharded step:
    same loss and same updated params (up to collective reduction order)."""
    import jax.numpy as jnp

    from tris_tpu.parallel.mesh import shard_batch
    from tris_tpu.parallel.tp import MODEL_AXIS, create_mesh_2d, shard_tree
    from tris_tpu.train.stage1 import make_train_step
    from tris_tpu.train.state import create_train_state

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")

    model, critic = _tiny_stage1()
    B, S, size = 4, 2, 64
    key = jax.random.PRNGKey(0)
    image = jnp.zeros((B, size, size, 3), jnp.float32)
    word_ids = jnp.asarray(_tokens(B))
    variables = model.init(key, image, word_ids, train=True)
    critic_vars = critic.init(key, image, word_ids)
    batch = {
        "image": np.random.default_rng(0).standard_normal((B, size, size, 3)).astype(np.float32),
        "word_ids": _tokens(B),
        "neg_word_ids": np.broadcast_to(_tokens(B)[:, None], (B, S, 20)).copy(),
    }

    def one_step(mesh):
        state = create_train_state(model, variables, total_steps=100, stage="stage1")
        b = dict(batch)
        if mesh is not None:
            state = shard_tree(state, mesh)
            cv = shard_tree(critic_vars, mesh)
            b = shard_batch(mesh, b)
        else:
            cv = critic_vars
        step = make_train_step(model, critic, donate=False)
        new_state, metrics = step(state, b, cv)
        return float(metrics["loss"]), new_state

    loss_ref, state_ref = one_step(None)
    mesh = create_mesh_2d(2, 4)
    assert mesh.shape == {"data": 2, MODEL_AXIS: 4}
    loss_tp, state_tp = one_step(mesh)

    np.testing.assert_allclose(loss_tp, loss_ref, rtol=2e-4)
    # params updated identically; spot-check across several leaves
    leaves_ref = jax.tree_util.tree_leaves(state_ref.params)
    leaves_tp = jax.tree_util.tree_leaves(state_tp.params)
    assert len(leaves_ref) == len(leaves_tp)
    for a, b_ in zip(leaves_ref[::7], leaves_tp[::7]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-3)
    # at least one big kernel is actually sharded over the model axis
    from jax.sharding import PartitionSpec as P

    sharded = [
        l for l in jax.tree_util.tree_leaves(state_tp.params)
        if getattr(l.sharding, "spec", P()) != P()
    ]
    assert sharded, "no parameter ended up model-sharded"


def test_irn_train_sharded_matches_single_device():
    """DP-sharded IRN affinity training == the single-device steps (VERDICT r4
    item 1: the reference scales this trainer with DataParallel to 4 GPUs at
    global bs 96, IRNet/step_refer/train_irn.py:38, README.md:127-142).

    3 steps at batch 8 over the 8-device mesh vs 1 device, identical batches.
    The optimizer is plain SGD (momentum 1e-4 — the reference's misrouted
    weight_decay), so there is no eps-denominator to amplify GSPMD's
    reduction-reassociation noise; bound each trained leaf's divergence
    relative to its own 3-step update (the stable contract from
    test_train.py's SGD chain twin). Frozen-trunk leaves get set_to_zero()
    updates and must match EXACTLY."""
    from flax.traverse_util import flatten_dict

    from tris_tpu.parallel.mesh import replicate_tree
    from tris_tpu.pseudo.aug import affinity_labels_from_indices
    from tris_tpu.pseudo.indexing import PathIndex
    from tris_tpu.pseudo.irnet import IRNet
    from tris_tpu.pseudo.train_irn import (
        IRNTrainConfig,
        create_irn_state,
        make_irn_train_step,
    )

    crop, radius, B, steps = 64, 4, 8, 3
    pi = PathIndex(radius, (crop // 4, crop // 4))
    model = IRNet()
    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, crop, crop, 3), np.float32))
    tcfg = IRNTrainConfig(crop_size=crop, radius=radius, batch_size=B)

    rng = np.random.default_rng(7)

    def mk_batch():
        imgs = rng.standard_normal((B, crop, crop, 3)).astype(np.float32)
        bgs, fgs, negs = [], [], []
        for _ in range(B):
            lab = rng.choice(np.array([0, 1, 255], np.uint8), (crop // 4, crop // 4),
                             p=[0.45, 0.35, 0.2])
            bg, fg, neg = affinity_labels_from_indices(lab, pi.src_indices, pi.dst_indices)
            bgs.append(bg)
            fgs.append(fg)
            negs.append(neg)
        return {"image": imgs, "aff_bg_pos": np.stack(bgs),
                "aff_fg_pos": np.stack(fgs), "aff_neg": np.stack(negs)}

    batches = [mk_batch() for _ in range(steps)]
    step_fn = make_irn_train_step(model, pi, donate=False)

    def run(mesh):
        state = create_irn_state(model, variables, tcfg, max_step=100)
        if mesh is not None:
            state = replicate_tree(mesh, state)
        losses = []
        for b in batches:
            bb = shard_batch(mesh, b) if mesh is not None else b
            state, metrics = step_fn(state, bb)
            losses.append(float(metrics["loss"]))
        return losses, jax.tree_util.tree_map(np.asarray, state.params)

    losses_ref, params_ref = run(None)
    mesh = create_mesh_for_batch(B)
    assert mesh.devices.size == min(8, jax.device_count())
    losses_dp, params_dp = run(mesh)

    np.testing.assert_allclose(losses_dp, losses_ref, rtol=1e-5)
    p0 = flatten_dict(jax.tree_util.tree_map(np.asarray, variables["params"]))
    d = {k: float(np.abs(a - b).max())
         for (k, a), b in zip(flatten_dict(params_dp).items(),
                              flatten_dict(params_ref).values())}
    upd = {k: float(np.abs(np.asarray(v) - p0[k]).max())
           for k, v in flatten_dict(params_ref).items()}
    frozen = {k for k in d if not (k[0].startswith("fc_edge") or k[0].startswith("fc_dp")
                                   or k[0].startswith("dp"))}
    assert frozen and all(d[k] == 0.0 for k in frozen), \
        {k: d[k] for k in frozen if d[k] != 0.0}
    trained = {k: (d[k], upd[k]) for k in d if k not in frozen}
    assert trained
    bad = {k: v for k, v in trained.items() if v[0] >= 0.25 * v[1] + 1e-7}
    assert not bad, bad
