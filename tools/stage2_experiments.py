"""Stage-2 train-step roofline experiments (round-3 follow-up).

Stage-1 and the critic both got per-piece rooflines (PERF_NOTES); the stage-2
step (reference hot loop `/root/reference/train_stage2.py:290-332`) has only
totals: 479 img/s/chip without EMA, ~400 with. By FLOP count the decoder
(fusion@c2-c4 + FPN + 4 side heads, model_stage2.py:115-134) should cost a
few ms, yet the no-EMA step is ~22 ms slower than the stage-1 step minus its
critic. Each experiment isolates one jitted piece on the real TPU with the
device-resident-checksum methodology bench.py uses (relay-safe).

Run: python tools/stage2_experiments.py [exp names...]
Findings land in docs/PERF_NOTES.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 48
SIZE = 320


def _ids(n):
    ids = np.zeros((n, 20), np.int32)
    ids[:, 0], ids[:, 1], ids[:, 2] = 49406, 786, 49407
    return jnp.asarray(ids)


def _stage2_setup(use_ema=False):
    from tris_tpu.models.stage2 import Stage2Config, TRISStage2
    from tris_tpu.train.stage2 import Stage2TrainConfig, make_train_step
    from tris_tpu.train.state import create_train_state

    model = TRISStage2(Stage2Config(), dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((B, SIZE, SIZE, 3), jnp.float32)
    ids = _ids(B)
    variables = jax.jit(lambda k: model.init(k, img, ids, train=True))(key)
    state = create_train_state(model, variables, total_steps=10 ** 6,
                               stage="stage2", with_ema=use_ema)
    step = make_train_step(model, Stage2TrainConfig(use_ema=use_ema))
    batch = {
        "image": jax.random.normal(key, (B, SIZE, SIZE, 3), jnp.float32),
        "word_ids": ids,
        "pseudo": (jax.random.uniform(key, (B, SIZE, SIZE, 1)) > 0.5).astype(jnp.float32),
    }
    return model, state, step, batch


def exp_profile(use_ema=False):
    """Per-op device profile of the stage-2 train step."""
    from tools.profile_ops import profile_top_ops

    model, state, step, batch = _stage2_setup(use_ema)
    state, m = step(state, batch)
    float(m["loss"])
    state, m = step(state, batch)
    float(m["loss"])

    holder = {"state": state}

    def run():
        holder["state"], mm = step(holder["state"], batch)
        float(mm["loss"])

    profile_top_ops(run, iters=10, top=45)


def exp_step(use_ema=False, iters=50):
    """Whole-step img/s (sanity vs bench.py)."""
    model, state, step, batch = _stage2_setup(use_ema)
    state, m = step(state, batch)
    float(m["loss"])
    state, m = step(state, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"stage2 step use_ema={use_ema}: {dt * 1e3:.1f} ms/step, "
          f"{B / dt:.0f} img/s/chip")


def exp_pieces(which="all"):
    """Loss-ablated steps: same train step, loss truncated at different depths,
    so each diff isolates one piece's fwd+bwd (+AdamW on its params)."""
    from tris_tpu.models.stage2 import Stage2Config, TRISStage2
    from tris_tpu.train.state import create_train_state

    model = TRISStage2(Stage2Config(), dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((B, SIZE, SIZE, 3), jnp.float32)
    ids = _ids(B)
    variables = jax.jit(lambda k: model.init(k, img, ids, train=True))(key)

    def make(loss_fn):
        state = create_train_state(model, variables, total_steps=10 ** 6,
                                   stage="stage2", with_ema=False)

        def loss(params, batch_stats, batch):
            outs, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["image"], batch["word_ids"], train=True,
                mutable=["batch_stats"],
            )
            return loss_fn(outs, batch), mut["batch_stats"]

        @jax.jit
        def step(state, batch):
            (l, new_stats), grads = jax.value_and_grad(loss, has_aux=True)(
                state.params, state.batch_stats, batch)
            return state.apply_gradients(grads, new_stats), l

        return state, step

    from tris_tpu import losses

    batch = {
        "image": jax.random.normal(key, (B, SIZE, SIZE, 3), jnp.float32),
        "word_ids": ids,
        "pseudo": (jax.random.uniform(key, (B, SIZE, SIZE, 1)) > 0.5).astype(jnp.float32),
    }

    def run(name, loss_fn, iters=30):
        state, step = make(loss_fn)
        state, l = step(state, batch)
        float(l)
        state, l = step(state, batch)
        float(l)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, l = step(state, batch)
        float(l)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:32s} {dt * 1e3:7.1f} ms/step  {B / dt:6.0f} img/s")
        return dt

    # full: all four side BCEs (the real no-EMA loss)
    if which in ("all", "full"):
        run("full (4xBCE)", lambda outs, b: sum(
            losses.bce_with_logits(o, b["pseudo"]) for o in outs))
    # only the deepest side output (out4 path: trunk + attn4 + reduced_c4 +
    # output4 + final_seg4 + its 320px upsample)
    if which in ("all", "out4"):
        run("out4 only", lambda outs, b: losses.bce_with_logits(outs[3], b["pseudo"]))
    # out1 only (full decoder depth, single BCE)
    if which in ("all", "out1"):
        run("out1 only", lambda outs, b: losses.bce_with_logits(outs[0], b["pseudo"]))
    # means instead of BCE (ablates the 320px-map BCE arithmetic; keeps all
    # upsamples since outs are already upsampled)
    if which in ("all", "mean"):
        run("4x mean (no BCE)", lambda outs, b: sum(
            o.astype(jnp.float32).mean() for o in outs))


def exp_trunk_anchor():
    """Trunk-only fwd+bwd+AdamW anchor at the same B/size (what stage-1's
    breakdown calls 'model fwd/bwd + per-group AdamW' minus its head)."""
    from tris_tpu.models.stage2 import Stage2Config, TRISStage2
    from tris_tpu.train.state import create_train_state

    model = TRISStage2(Stage2Config(), dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((B, SIZE, SIZE, 3), jnp.float32)
    ids = _ids(B)
    variables = jax.jit(lambda k: model.init(k, img, ids, train=True))(key)
    state = create_train_state(model, variables, total_steps=10 ** 6,
                               stage="stage2", with_ema=False)

    def loss(params, batch_stats, batch):
        # encode_image only (c4 mean) — decoder and text tower DCE'd
        (c1, c2, c3, c4, _), mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"],
            method=lambda m, im: m.backbone.encode_image(im, train=True),
            mutable=["batch_stats"],
        )
        return c4.astype(jnp.float32).mean(), mut["batch_stats"]

    @jax.jit
    def step(state, batch):
        (l, new_stats), grads = jax.value_and_grad(loss, has_aux=True)(
            state.params, state.batch_stats, batch)
        return state.apply_gradients(grads, new_stats), l

    batch = {"image": jax.random.normal(key, (B, SIZE, SIZE, 3), jnp.float32)}
    state, l = step(state, batch)
    float(l)
    state, l = step(state, batch)
    float(l)
    t0 = time.perf_counter()
    iters = 30
    for _ in range(iters):
        state, l = step(state, batch)
    float(l)
    dt = (time.perf_counter() - t0) / iters
    print(f"trunk-only fwd/bwd+AdamW: {dt * 1e3:.1f} ms/step  {B / dt:.0f} img/s")


EXPS = {
    "profile": exp_profile,
    "profile_ema": lambda: exp_profile(True),
    "step": exp_step,
    "step_ema": lambda: exp_step(True),
    "pieces": exp_pieces,
    "pieces_full": functools.partial(exp_pieces, which="full"),
    "pieces_out4": functools.partial(exp_pieces, which="out4"),
    "pieces_out1": functools.partial(exp_pieces, which="out1"),
    "pieces_mean": functools.partial(exp_pieces, which="mean"),
    "trunk": exp_trunk_anchor,
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["step", "pieces"]
    for n in names:
        print(f"== {n} ==")
        EXPS[n]()
