"""Train-step tests: one full optimization step on a virtual 8-device DP mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from tests.helpers import TINY_RESNET_CLIP, TINY_VIT_CLIP
from tris_tpu.models.clip import CLIP
from tris_tpu.models.stage1 import Stage1Config, TRISStage1
from tris_tpu.models.stage2 import Stage2Config, TRISStage2
from tris_tpu.parallel.mesh import create_mesh, replicate_tree, shard_batch
from tris_tpu.train import stage1 as train_stage1
from tris_tpu.train import stage2 as train_stage2
from tris_tpu.train.state import (
    create_train_state,
    make_optimizer,
    poly_epoch_schedule,
    poly_schedule,
)


def _tree_delta(a, b):
    fa, fb = flatten_dict(a), flatten_dict(b)
    return {k: float(np.abs(np.asarray(fa[k]) - np.asarray(fb[k])).max()) for k in fa}


def test_poly_schedule():
    sched = poly_schedule(1.0, 100, 0.9)
    assert float(sched(0)) == 1.0
    assert np.isclose(float(sched(50)), 0.5 ** 0.9)
    assert float(sched(100)) == 0.0


def test_poly_epoch_schedule_matches_reference_polynomial_lr_decay():
    """Pins PolynomialLRDecay semantics (utils/poly_lr_decay.py:22-28):
    lr(epoch) = (base-end)*(1-epoch/max)^p + end, frozen at end after max."""
    base, end, power, max_decay, spe = 1.0, 0.1, 2.0, 4, 10
    sched = poly_epoch_schedule(base, end, power, max_decay, spe)

    def ref_lr(last_step):
        if last_step > max_decay:
            return end
        return (base - end) * (1 - last_step / max_decay) ** power + end

    for epoch in range(8):
        # during epoch k the torch scheduler has been stepped k times
        got = float(sched(epoch * spe + 3))
        assert np.isclose(got, ref_lr(epoch), rtol=1e-6), (epoch, got, ref_lr(epoch))


def test_optimizer_groups_stage1():
    """backbone at 0.1x lr, heads at 1x, logit_scale frozen (reference quirk)."""
    cfg = Stage1Config(hidden_dim=32, clip_override=TINY_RESNET_CLIP)
    model = TRISStage1(cfg)
    img = jnp.zeros((2, 64, 64, 3))
    ids = jnp.ones((2, 20), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, ids, train=False)
    params = variables["params"]
    tx = make_optimizer(params, base_lr=1.0, lr_multi=0.1, weight_decay=0.0, total_steps=10 ** 9)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    flat = flatten_dict(updates)
    # logit_scale frozen
    assert float(np.abs(flat[("logit_scale",)])) == 0.0
    # backbone step ~0.1x of head step (unit grads -> adam update = lr)
    bb = np.abs(np.asarray(flat[("backbone", "visual", "conv1", "kernel")])).max()
    hd = np.abs(np.asarray(flat[("vis_project", "kernel")])).max()
    assert np.isclose(bb / hd, 0.1, rtol=1e-3)


@pytest.fixture(scope="module")
def stage1_setup():
    cfg = Stage1Config(hidden_dim=32, clip_override=TINY_RESNET_CLIP)
    model = TRISStage1(cfg)
    critic = CLIP(TINY_VIT_CLIP)
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((8, 64, 64, 3))
    ids = jnp.ones((8, 20), jnp.int32).at[:, 5].set(49407)
    variables = model.init(key, img, ids, train=True)
    critic_vars = critic.init(key, img, ids)
    return model, critic, variables, critic_vars


def test_stage1_train_step_on_mesh(stage1_setup, rng):
    model, critic, variables, critic_vars = stage1_setup
    mesh = create_mesh()
    B, S = 8, 3
    batch = {
        "image": rng.standard_normal((B, 64, 64, 3)).astype(np.float32),
        "word_ids": np.tile(np.array([[49406, 10, 20, 49407] + [0] * 16], np.int32), (B, 1)),
        "neg_word_ids": np.tile(np.array([[49406, 30, 49407] + [0] * 17], np.int32), (B, S, 1)),
    }
    state = create_train_state(model, variables, total_steps=100, stage="stage1")
    step_fn = train_stage1.make_train_step(model, critic, donate=False)

    state_r = jax.device_put(state, None)
    batch_s = shard_batch(mesh, batch)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    new_state, metrics = step_fn(state_r, batch_s, critic_vars)
    for k in ("loss", "l1", "l4", "l5"):
        assert np.isfinite(float(metrics[k])), k
    assert float(metrics["l5"]) > 0.0
    # params moved, logit_scale did not
    deltas = _tree_delta(p0, jax.tree_util.tree_map(np.asarray, new_state.params))
    assert deltas[("logit_scale",)] == 0.0
    assert deltas[("vis_project", "kernel")] > 0.0
    assert deltas[("backbone", "visual", "conv1", "kernel")] > 0.0
    assert int(new_state.step) == 1


def _stack_batches(*batches):
    """Stack per-step batches along a leading chain axis (the chain>1 batch
    contract of make_train_step)."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)


def test_stage2_chained_step_matches_two_steps(rng):
    """bench.py's TRIS_BENCH_CHAIN path: a chain=2 program scanning over two
    stacked DISTINCT batches must equal two chain=1 steps on those batches in
    order (same EMA counter progression).

    Tolerance note (diagnosed round 4): the chain's ``lax.scan`` body is a
    SEPARATELY COMPILED program whose reduction fusion order differs from the
    standalone step's, so gradients carry ~4e-6 of reassociation noise
    (measured; a composed jit of two standalone steps — same fusions — matches
    two dispatches to 1.5e-8, which pins the chaining *logic* as exact, and an
    SGD run below pins it end-to-end). AdamW's ``m/(sqrt(v)+eps)`` turns that
    noise into full sign flips wherever |grad| ~ eps=1e-8 — the divergent
    leaves are exactly the near-zero-gradient attention biases (|g| ~ 5e-8) —
    so the worst-case per-element divergence is the full update magnitude,
    ~2*lr per step. Bound: steps * 2 * head_lr, with slack for the second
    step's compounding.
    """
    cfg = Stage2Config(clip_override=TINY_RESNET_CLIP)
    model = TRISStage2(cfg)
    B = 2
    img = jnp.zeros((B, 64, 64, 3))
    ids = jnp.ones((B, 20), jnp.int32).at[:, 3].set(49407)
    variables = model.init(jax.random.PRNGKey(1), img, ids, train=True)
    tcfg = train_stage2.Stage2TrainConfig(use_ema=True, ema_update_after=0, ema_update_every=1)
    def mk_batch():
        return {
            "image": rng.standard_normal((B, 64, 64, 3)).astype(np.float32),
            "word_ids": np.asarray(ids),
            "pseudo": (rng.random((B, 64, 64, 1)) > 0.5).astype(np.float32),
        }

    batch_a, batch_b = mk_batch(), mk_batch()
    base_lr = 5e-5

    state = create_train_state(model, variables, total_steps=100, stage="stage2",
                               with_ema=True, base_lr=base_lr)
    one = train_stage2.make_train_step(model, tcfg, donate=False)
    s_ref, _ = one(state, batch_a)
    s_ref, m_ref = one(s_ref, batch_b)

    state2 = create_train_state(model, variables, total_steps=100, stage="stage2",
                                with_ema=True, base_lr=base_lr)
    two = train_stage2.make_train_step(model, tcfg, donate=False, chain=2)
    s_chain, m_chain = two(state2, _stack_batches(batch_a, batch_b))

    assert int(s_chain.step) == int(s_ref.step) == 2
    np.testing.assert_allclose(float(m_chain["loss"]), float(m_ref["loss"]), rtol=1e-5)
    adamw_bound = 2 * 2.0 * base_lr * 1.5  # steps * max|update| * slack
    d = _tree_delta(
        jax.tree_util.tree_map(np.asarray, s_chain.params),
        jax.tree_util.tree_map(np.asarray, s_ref.params),
    )
    assert max(d.values()) < adamw_bound, max(d.items(), key=lambda kv: kv[1])
    d_ema = _tree_delta(
        jax.tree_util.tree_map(np.asarray, s_chain.ema_params),
        jax.tree_util.tree_map(np.asarray, s_ref.ema_params),
    )
    assert max(d_ema.values()) < adamw_bound


def test_stage2_chained_step_matches_two_steps_sgd(rng):
    """The amplification-free twin of the test above: with plain SGD the
    update is lr * grad, so there is no eps-denominator to amplify the scan
    body's gradient reassociation noise.

    Contract (diagnosed round 4; the noise is real but bounded): per leaf,
    |chained - two-step| must stay under 0.5 * |two-step update| + 2e-7.
    Measured across seeds the worst leaf sits at ~0.06 * update (heavy-tailed:
    typical draws land at 1e-7..1.5e-6 absolute; one adversarial draw at
    2.2e-5 on a conv kernel whose 2-step update was ~4e-4, and a round-5
    full-suite run — the session rng advances differently there, changing the
    batch draw — hit 0.36 * update on a single attention kernel whose 2-step
    update was 7e-6, which is why the bound is 0.5 not 0.25) — reassociation
    noise scales WITH the gradient, so an update-relative bound is the stable
    one. Any real chaining bug moves leaves at FULL update scale (measured:
    swapping the two batches' order shifts params ~2e-4, i.e. 2x the bound)
    and batch mis-threading flips the last-step loss at O(%), caught by the
    rtol=1e-5 loss check. The losses-agree + step-count + update-relative
    triple separates semantics (exact) from compile-fusion noise (bounded)."""
    import optax

    cfg = Stage2Config(clip_override=TINY_RESNET_CLIP)
    model = TRISStage2(cfg)
    B = 2
    img = jnp.zeros((B, 64, 64, 3))
    ids = jnp.ones((B, 20), jnp.int32).at[:, 3].set(49407)
    variables = model.init(jax.random.PRNGKey(1), img, ids, train=True)
    tcfg = train_stage2.Stage2TrainConfig(use_ema=True, ema_update_after=0, ema_update_every=1)
    def mk_batch():
        return {
            "image": rng.standard_normal((B, 64, 64, 3)).astype(np.float32),
            "word_ids": np.asarray(ids),
            "pseudo": (rng.random((B, 64, 64, 1)) > 0.5).astype(np.float32),
        }

    batch_a, batch_b = mk_batch(), mk_batch()

    def mk():
        s = create_train_state(model, variables, total_steps=100, stage="stage2", with_ema=True)
        tx = optax.sgd(1e-3)
        return s.replace(tx=tx, opt_state=tx.init(s.params))

    p0 = jax.tree_util.tree_map(np.asarray, mk().params)

    one = train_stage2.make_train_step(model, tcfg, donate=False)
    s_ref, _ = one(mk(), batch_a)
    s_ref, m_ref = one(s_ref, batch_b)

    two = train_stage2.make_train_step(model, tcfg, donate=False, chain=2)
    s_chain, m_chain = two(mk(), _stack_batches(batch_a, batch_b))

    assert int(s_chain.step) == int(s_ref.step) == 2
    np.testing.assert_allclose(float(m_chain["loss"]), float(m_ref["loss"]), rtol=1e-5)

    p_ref = jax.tree_util.tree_map(np.asarray, s_ref.params)
    d = _tree_delta(jax.tree_util.tree_map(np.asarray, s_chain.params), p_ref)
    upd = _tree_delta(p_ref, p0)  # per-leaf 2-step update magnitude
    bad = {k: (d[k], upd[k]) for k in d if d[k] >= 0.5 * upd[k] + 2e-7}
    assert not bad, bad
    d_ema = _tree_delta(
        jax.tree_util.tree_map(np.asarray, s_chain.ema_params),
        jax.tree_util.tree_map(np.asarray, s_ref.ema_params),
    )
    # EMA is a convex average of param trajectories, so its divergence is
    # bounded by the params' (same noise source, damped by the decay)
    assert max(d_ema.values()) < 0.5 * max(upd.values()) + 2e-7


def test_stage2_train_step_with_ema(rng):
    cfg = Stage2Config(clip_override=TINY_RESNET_CLIP)
    model = TRISStage2(cfg)
    B = 4
    img = jnp.zeros((B, 64, 64, 3))
    ids = jnp.ones((B, 20), jnp.int32).at[:, 3].set(49407)
    variables = model.init(jax.random.PRNGKey(1), img, ids, train=True)
    state = create_train_state(model, variables, total_steps=100, stage="stage2", with_ema=True)
    tcfg = train_stage2.Stage2TrainConfig(use_ema=True, ema_update_after=0, ema_update_every=1)
    step_fn = train_stage2.make_train_step(model, tcfg, donate=False)
    batch = {
        "image": rng.standard_normal((B, 64, 64, 3)).astype(np.float32),
        "word_ids": np.asarray(ids),
        "pseudo": (rng.random((B, 64, 64, 1)) > 0.5).astype(np.float32),
    }
    new_state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["l5"]) >= 0.0
    new_state2, _ = step_fn(new_state, batch)
    # EMA params should have moved after step 2 (update_after=0, step>0 check)
    d = _tree_delta(
        jax.tree_util.tree_map(np.asarray, new_state2.ema_params),
        jax.tree_util.tree_map(np.asarray, state.ema_params),
    )
    assert max(d.values()) > 0.0


def test_stage2_ema_teacher_semantics(rng):
    """Pins ema_pytorch teacher semantics (reference EMA(model) defaults,
    train_stage2.py:258-260,328-332):
    - copy phase: while counter <= update_after, on update steps the teacher
      (params AND BN buffers) is copied from the student;
    - afterwards it moves by EMA with the ramped decay;
    - between update steps it stays frozen."""
    B = 4
    cfg = Stage2Config(clip_override=TINY_RESNET_CLIP)
    model = TRISStage2(cfg)
    img = jnp.zeros((B, 64, 64, 3))
    ids = jnp.ones((B, 20), jnp.int32).at[:, 5].set(49407)
    variables = model.init(jax.random.PRNGKey(1), img, ids, train=True)
    batch = {
        "image": rng.standard_normal((B, 64, 64, 3)).astype(np.float32),
        "word_ids": np.asarray(ids),
        "pseudo": (rng.random((B, 64, 64, 1)) > 0.5).astype(np.float32),
    }

    # update_after=2, update_every=2: counters 0,2 copy; 4+ EMA; odd counters frozen
    tcfg = train_stage2.Stage2TrainConfig(use_ema=True, ema_update_after=2, ema_update_every=2)
    step_fn = train_stage2.make_train_step(model, tcfg, donate=False)
    state = create_train_state(model, variables, total_steps=100, stage="stage2", with_ema=True)

    def leaves(tree):
        return jax.tree_util.tree_map(np.asarray, tree)

    s1, _ = step_fn(state, batch)  # counter 0: copy phase, update step
    np.testing.assert_allclose(
        np.asarray(flatten_dict(leaves(s1.ema_params))[("output1", "conv", "kernel")]),
        np.asarray(flatten_dict(leaves(s1.params))[("output1", "conv", "kernel")]),
    )
    np.testing.assert_allclose(
        np.asarray(flatten_dict(leaves(s1.ema_batch_stats))[("output1", "bn", "mean")]),
        np.asarray(flatten_dict(leaves(s1.batch_stats))[("output1", "bn", "mean")]),
    )

    s2, _ = step_fn(s1, batch)  # counter 1: frozen
    assert max(_tree_delta(leaves(s2.ema_params), leaves(s1.ema_params)).values()) == 0.0

    s3, _ = step_fn(s2, batch)  # counter 2: still copy phase (<= update_after)
    np.testing.assert_allclose(
        np.asarray(flatten_dict(leaves(s3.ema_params))[("output1", "conv", "kernel")]),
        np.asarray(flatten_dict(leaves(s3.params))[("output1", "conv", "kernel")]),
    )

    s4, _ = step_fn(s3, batch)  # counter 3: frozen
    s5, _ = step_fn(s4, batch)  # counter 4: EMA with decay 1-(1+1)^(-2/3)
    decay = 1.0 - (1.0 + 1.0) ** (-2.0 / 3.0)
    key = ("output1", "conv", "kernel")
    expect = (np.asarray(flatten_dict(leaves(s4.ema_params))[key]) * decay
              + np.asarray(flatten_dict(leaves(s5.params))[key]) * (1 - decay))
    np.testing.assert_allclose(
        np.asarray(flatten_dict(leaves(s5.ema_params))[key]), expect, rtol=1e-5, atol=1e-7
    )
    # teacher no longer equals student once EMA starts
    assert _tree_delta(leaves(s5.ema_params), leaves(s5.params))[key] > 0.0


def test_stage2_positional_embedding_in_head_group():
    cfg = Stage2Config(clip_override=TINY_RESNET_CLIP)
    model = TRISStage2(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    ids = jnp.ones((1, 20), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, ids, train=False)
    tx = make_optimizer(
        variables["params"], base_lr=1.0, lr_multi=0.1, weight_decay=0.0,
        total_steps=10 ** 9, stage="stage2",
    )
    opt_state = tx.init(variables["params"])
    grads = jax.tree_util.tree_map(jnp.ones_like, variables["params"])
    updates, _ = tx.update(grads, opt_state, variables["params"])
    flat = flatten_dict(updates)
    pe = np.abs(np.asarray(flat[("backbone", "positional_embedding")])).max()
    bb = np.abs(np.asarray(flat[("backbone", "visual", "conv1", "kernel")])).max()
    assert np.isclose(pe / bb, 10.0, rtol=1e-3)  # pe in head group (1x vs 0.1x)


def test_ema_state_does_not_alias_params():
    """create_train_state(with_ema=True) must deep-copy params into the
    teacher: with device-array inputs an aliased tree would hand the donated
    TPU train step the same buffer twice (runtime InvalidArgument)."""
    import jax.numpy as jnp

    from tris_tpu.models.stage2 import Stage2Config, TRISStage2
    from tris_tpu.train.state import create_train_state

    model = TRISStage2(Stage2Config(clip_override=TINY_RESNET_CLIP))
    img = jnp.zeros((1, 64, 64, 3))
    ids = jnp.ones((1, 20), jnp.int32)
    # jitted init -> device-array leaves (the aliasing-prone case)
    variables = jax.jit(lambda k: model.init(k, img, ids, train=True))(jax.random.PRNGKey(0))
    state = create_train_state(model, variables, total_steps=10, stage="stage2", with_ema=True)
    p = jax.tree_util.tree_leaves(state.params)
    e = jax.tree_util.tree_leaves(state.ema_params)
    assert all(
        a.unsafe_buffer_pointer() != b.unsafe_buffer_pointer() for a, b in zip(p, e)
    )
