"""Benchmark: stage-1 TRIS (CLIP-RN50) inference throughput at 320px on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md), and this
environment has no CUDA GPU to measure the PyTorch reference on, so
``vs_baseline`` reports the ratio against a recorded baseline in
``BASELINE.json`` under ``published.pytorch_images_per_sec`` when present,
else null.

Env knobs:
  TRIS_BENCH_BATCH   (default 128)
  TRIS_BENCH_SIZE    (default 320)
  TRIS_BENCH_DTYPE   (default bf16; 'f32' for full precision)
  TRIS_BENCH_ITERS   (default 100; train mode 50)
  TRIS_BENCH_MODE    (default 'infer'; 'train' benches the full stage-1
                      training step incl. frozen-critic losses + AdamW;
                      'prms' benches the fused PRMS program — S model
                      forwards + SxS critic scoring per ref, the reference's
                      offline hot loop validate.py:311-328;
                      'eval' benches the multi-sentence eval forward
                      (response_maps: trunk shared across sentences) — the
                      reference's per-epoch validation loop validate.py:173-179;
                      'train2' benches the stage-2 training step: 4-side-output
                      BCE vs pseudo-masks + EMA mean-teacher consistency +
                      AdamW, the reference's train_stage2.py:290-332 hot loop)
  TRIS_BENCH_SENTS   (prms mode: sentences per ref bucket, default 4)
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tris_tpu.models.stage1 import Stage1Config, TRISStage1

    mode = os.environ.get("TRIS_BENCH_MODE", "infer")
    if mode == "train":
        return bench_train()
    if mode == "prms":
        return bench_prms()
    if mode == "eval":
        return bench_eval()
    if mode == "train2":
        return bench_train2()

    batch = int(os.environ.get("TRIS_BENCH_BATCH", 128))  # sweep: 128 beats 64/256 on v5e
    size = int(os.environ.get("TRIS_BENCH_SIZE", 320))
    iters = int(os.environ.get("TRIS_BENCH_ITERS", 100))  # amortize relay dispatch overhead
    dtype = jnp.bfloat16 if os.environ.get("TRIS_BENCH_DTYPE", "bf16") == "bf16" else jnp.float32

    model = TRISStage1(Stage1Config(backbone="RN50", hidden_dim=1024, txt_length=20), dtype=dtype)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((batch, size, size, 3)), jnp.float32)
    word_ids = np.zeros((batch, 20), np.int32)
    word_ids[:, 0], word_ids[:, 1], word_ids[:, 2] = 49406, 786, 49407
    word_ids = jnp.asarray(word_ids)

    variables = jax.jit(lambda k: model.init(k, image, word_ids, train=False))(jax.random.PRNGKey(0))

    @jax.jit
    def forward(variables, image, word_ids):
        return model.apply(variables, image, word_ids, train=False)

    # Pre-stage distinct device-resident inputs (exclude host->device transfer
    # from the measurement, and defeat any transparent duplicate-dispatch
    # caching in the runtime).
    n_inputs = 4
    keys = jax.random.split(jax.random.PRNGKey(1), n_inputs)
    images = [jax.random.normal(k, (batch, size, size, 3), jnp.float32) for k in keys]
    jax.block_until_ready(images)

    @jax.jit
    def step_checksum(acc, out):
        return acc + out.mean()

    # compile + warmup (fetch a value: on relayed runtimes block_until_ready
    # can return before remote execution completes, so sync via fetch)
    acc = jnp.zeros((), jnp.float32)
    acc = step_checksum(acc, forward(variables, images[0], word_ids))
    acc = step_checksum(acc, forward(variables, images[1], word_ids))
    float(acc)

    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for i in range(iters):
        acc = step_checksum(acc, forward(variables, images[i % n_inputs], word_ids))
    float(acc)  # forces completion of every iteration
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
    n_chips = jax.device_count()
    ips_per_chip = ips / n_chips

    vs = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "BASELINE.json")) as f:
            published = json.load(f).get("published", {})
        ref = published.get("pytorch_images_per_sec")
        if ref:
            vs = ips_per_chip / float(ref)
    except Exception:
        pass

    print(json.dumps({
        "metric": "stage1_rn50_320px_inference_throughput_per_chip",
        "value": round(ips_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": vs,
    }))


def bench_train() -> None:
    """Full stage-1 training step throughput (model fwd/bwd + frozen ViT-B/32
    critic losses + per-group AdamW update)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tris_tpu.models.clip import CLIP, CLIP_CONFIGS
    from tris_tpu.models.stage1 import Stage1Config, TRISStage1
    from tris_tpu.train.stage1 import Stage1LossWeights, make_train_step
    from tris_tpu.train.state import create_train_state

    batch = int(os.environ.get("TRIS_BENCH_BATCH", 48))
    size = int(os.environ.get("TRIS_BENCH_SIZE", 320))
    iters = int(os.environ.get("TRIS_BENCH_ITERS", 50))
    negatives = 3

    model = TRISStage1(Stage1Config(), dtype=jnp.bfloat16)
    critic = CLIP(dataclasses.replace(CLIP_CONFIGS["ViT-B-32"], txt_length=20),
                  dtype=jnp.bfloat16)
    img = jnp.zeros((batch, size, size, 3), jnp.float32)
    ids = jnp.zeros((batch, 20), jnp.int32).at[:, 0].set(49406).at[:, 2].set(49407)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k: model.init(k, img, ids, train=True))(key)
    critic_vars = jax.jit(lambda k: critic.init(k, jnp.zeros((1, 224, 224, 3)), ids[:1]))(key)
    state = create_train_state(model, variables, total_steps=10 ** 6)
    step = make_train_step(model, critic, Stage1LossWeights(), donate=True)
    bt = {
        "image": jax.random.normal(key, (batch, size, size, 3), jnp.float32),
        "word_ids": ids,
        "neg_word_ids": jnp.broadcast_to(ids[:, None], (batch, negatives, 20)),
    }
    state, m = step(state, bt, critic_vars)
    float(m["loss"])  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, bt, critic_vars)
    float(m["loss"])  # forces completion of the chain
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "stage1_rn50_320px_train_step_throughput_per_chip",
        "value": round(batch * iters / dt / jax.device_count(), 2),
        "unit": "images/sec/chip",
        "vs_baseline": None,
    }))


def bench_train2() -> None:
    """Stage-2 training step throughput: 4 side-output BCE vs pseudo-masks +
    EMA mean-teacher consistency + per-group AdamW (train/stage2.py)."""
    import jax
    import jax.numpy as jnp

    from tris_tpu.models.stage2 import Stage2Config, TRISStage2
    from tris_tpu.train.stage2 import Stage2TrainConfig, make_train_step
    from tris_tpu.train.state import create_train_state

    batch = int(os.environ.get("TRIS_BENCH_BATCH", 48))
    size = int(os.environ.get("TRIS_BENCH_SIZE", 320))
    iters = int(os.environ.get("TRIS_BENCH_ITERS", 50))

    model = TRISStage2(Stage2Config(), dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((batch, size, size, 3), jnp.float32)
    ids = jnp.zeros((batch, 20), jnp.int32).at[:, 0].set(49406).at[:, 2].set(49407)
    variables = jax.jit(lambda k: model.init(k, img, ids, train=True))(key)
    use_ema = os.environ.get("TRIS_BENCH_EMA", "1") == "1"
    state = create_train_state(model, variables, total_steps=10 ** 6, stage="stage2",
                               with_ema=use_ema)
    step = make_train_step(model, Stage2TrainConfig(use_ema=use_ema))
    bt = {
        "image": jax.random.normal(key, (batch, size, size, 3), jnp.float32),
        "word_ids": ids,
        "pseudo": (jax.random.uniform(key, (batch, size, size, 1)) > 0.5).astype(jnp.float32),
    }
    # warm TWO steps: the first output's buffer layouts differ from the
    # freshly-created state's, so the signature reaches its fixed point (and
    # the jit cache its steady size) only on the second call — timing from
    # one warmup would put a full recompile inside the loop (PERF_NOTES)
    state, m = step(state, bt)
    float(m["loss"])
    state, m = step(state, bt)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, bt)
    float(m["loss"])  # forces completion of the chain
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "stage2_rn50_320px_train_step_throughput_per_chip",
        "value": round(batch * iters / dt / jax.device_count(), 2),
        "unit": "images/sec/chip",
        "vs_baseline": None,
    }))


def bench_eval() -> None:
    """Multi-sentence eval forward throughput (refs/s): one shared image-trunk
    pass + S per-sentence text/fusion/head passes per ref
    (eval/validate.py::make_eval_forward). The reference runs S separate
    batch-1 full forwards per ref (validate.py:173-179)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tris_tpu.eval.validate import make_eval_forward
    from tris_tpu.models.stage1 import Stage1Config, TRISStage1

    batch = int(os.environ.get("TRIS_BENCH_BATCH", 16))   # refs per program
    sents = int(os.environ.get("TRIS_BENCH_SENTS", 4))    # bucketed S
    size = int(os.environ.get("TRIS_BENCH_SIZE", 320))
    # short per-iter programs need many iterations to amortize the relayed
    # runtime's fixed per-run dispatch overhead (PERF_NOTES: 180 -> 930
    # refs/s on PRMS going from 10 to 150 iters; device trace says ~12 ms/batch)
    iters = int(os.environ.get("TRIS_BENCH_ITERS", 100))

    model = TRISStage1(Stage1Config(), dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    image = jax.random.normal(key, (batch, size, size, 3), jnp.float32)
    ids = np.zeros((batch, sents, 20), np.int32)
    ids[..., 0], ids[..., 1], ids[..., 2] = 49406, 786, 49407
    ids = jnp.asarray(ids)
    variables = jax.jit(lambda k: model.init(k, image, ids[:, 0], train=False))(key)
    forward = make_eval_forward(model)

    @jax.jit
    def chk(acc, out):
        return acc + out.mean()

    acc = chk(jnp.zeros(()), forward(variables, image, ids))
    float(acc)  # compile + sync
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(iters):
        acc = chk(acc, forward(variables, image, ids))
    float(acc)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"eval_rn50_{size}px_S{sents}_refs_per_sec_per_chip",
        "value": round(batch * iters / dt / jax.device_count(), 2),
        "unit": "refs/sec/chip",
        "vs_baseline": None,
    }))


def bench_prms() -> None:
    """PRMS throughput: per ref, S model forwards (320px RN50) + S^2 critic
    scores, fused into one jit program (eval/validate.py::make_prms_forward).
    The reference runs this ref-by-ref at batch 1 with S^2 separate CLIP
    forwards (validate.py:311-328)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tris_tpu.eval.validate import make_prms_forward
    from tris_tpu.models.clip import CLIP, CLIP_CONFIGS
    from tris_tpu.models.stage1 import Stage1Config, TRISStage1

    batch = int(os.environ.get("TRIS_BENCH_BATCH", 16))   # refs per program
    sents = int(os.environ.get("TRIS_BENCH_SENTS", 4))    # bucketed S
    size = int(os.environ.get("TRIS_BENCH_SIZE", 320))
    iters = int(os.environ.get("TRIS_BENCH_ITERS", 100))  # see bench_eval note

    model = TRISStage1(Stage1Config(), dtype=jnp.bfloat16)
    critic = CLIP(dataclasses.replace(CLIP_CONFIGS["ViT-B-32"], txt_length=20),
                  dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    image = jax.random.normal(key, (batch, size, size, 3), jnp.float32)
    ids = np.zeros((batch, sents, 20), np.int32)
    ids[..., 0], ids[..., 1], ids[..., 2] = 49406, 786, 49407
    ids = jnp.asarray(ids)
    valid = jnp.ones((batch, sents), bool)
    variables = jax.jit(lambda k: model.init(k, image, ids[:, 0], train=False))(key)
    critic_vars = jax.jit(lambda k: critic.init(k, jnp.zeros((1, 224, 224, 3)), ids[:1, 0]))(key)

    forward = make_prms_forward(model, critic)
    best, cams, scores = forward(variables, critic_vars, image, ids, valid)
    float(scores.sum())  # compile + sync
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(iters):
        best, cams, scores = forward(variables, critic_vars, image, ids, valid)
        acc = acc + scores.sum()
    float(acc)
    dt = time.perf_counter() - t0
    refs_per_s = batch * iters / dt
    print(json.dumps({
        "metric": f"prms_rn50_{size}px_S{sents}_refs_per_sec_per_chip",
        "value": round(refs_per_s / jax.device_count(), 2),
        "unit": "refs/sec/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
