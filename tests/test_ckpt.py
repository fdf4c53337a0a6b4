import os

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import TINY_RESNET_CLIP
from tris_tpu.ckpt.io import (
    BestCheckpointKeeper,
    load_params_only,
    resume_train_state,
    save_train_checkpoint,
    save_variables,
    load_variables,
)
from tris_tpu.models.stage1 import Stage1Config, TRISStage1
from tris_tpu.train.state import create_train_state


def _make_state():
    model = TRISStage1(Stage1Config(hidden_dim=32, clip_override=TINY_RESNET_CLIP))
    img = jnp.zeros((1, 64, 64, 3))
    ids = jnp.ones((1, 20), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, ids, train=True)
    return create_train_state(model, variables, total_steps=10)


def test_variables_roundtrip(tmp_path):
    v = {"params": {"a": np.arange(6, dtype=np.float32).reshape(2, 3)}, "x": np.float32(2.0)}
    p = str(tmp_path / "v.msgpack")
    save_variables(p, v)
    back = load_variables(p)
    np.testing.assert_array_equal(back["params"]["a"], v["params"]["a"])


def test_full_train_resume(tmp_path):
    state = _make_state()
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    path = str(tmp_path / "ck.msgpack")
    save_train_checkpoint(path, state, extra={"epoch": 3})

    fresh = _make_state()
    resumed, start_epoch = resume_train_state(path, fresh)
    assert start_epoch == 4
    assert int(resumed.step) == 7
    # params identical
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(resumed.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # opt_state structure preserved
    assert jax.tree_util.tree_structure(resumed.opt_state) == jax.tree_util.tree_structure(
        fresh.opt_state
    )


def test_params_only_resume(tmp_path):
    state = _make_state()
    path = str(tmp_path / "vars.msgpack")
    save_variables(path, {"params": jax.tree_util.tree_map(np.asarray, state.params)})
    fresh = _make_state()
    resumed, start_epoch = resume_train_state(path, fresh)
    assert start_epoch is None
    p = load_params_only(path, fresh.params)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(p)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )


def test_best_keeper_deletes_previous(tmp_path):
    state = _make_state()
    keeper = BestCheckpointKeeper(str(tmp_path))
    b1 = keeper.update(0, miou=10.0, hit=5.0, state=state)
    first_path = b1["path"]
    keeper.wait()  # saves are async; flush before checking the filesystem
    assert os.path.exists(first_path)
    b2 = keeper.update(1, miou=20.0, hit=4.0, state=state)
    keeper.wait()
    assert not os.path.exists(first_path)      # previous best removed
    assert os.path.exists(b2["path"])
    assert os.path.exists(b1["hit_path"])      # hit best from epoch 0 kept
    b3 = keeper.update(2, miou=15.0, hit=3.0, state=state)
    keeper.wait()
    assert b3["path"] == b2["path"]            # no improvement -> unchanged


def test_async_save_overlaps_and_roundtrips(tmp_path):
    """The async path must (a) not corrupt checkpoints, (b) preserve the EMA
    trees, (c) survive a donation-style mutation of the device state right
    after submission (the fetch happens synchronously at submit time)."""
    model = TRISStage1(Stage1Config(hidden_dim=32, clip_override=TINY_RESNET_CLIP))
    img = jnp.zeros((1, 64, 64, 3))
    ids = jnp.ones((1, 20), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, ids, train=True)
    state = create_train_state(model, variables, total_steps=10, with_ema=True)

    keeper = BestCheckpointKeeper(str(tmp_path))
    snapshot = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    keeper.update(0, miou=1.0, hit=1.0, state=state)
    # mutate the live state immediately (as the next donated train step would)
    state = state.replace(
        params=jax.tree_util.tree_map(lambda x: x * 0 + 99.0, state.params)
    )
    keeper.wait()

    fresh = create_train_state(model, variables, total_steps=10, with_ema=True)
    resumed, _ = resume_train_state(keeper.best["path"], fresh)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(resumed.params)[0]), snapshot
    )
    assert resumed.ema_params is not None and resumed.ema_batch_stats is not None
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(resumed.ema_params)[0]), snapshot
    )
