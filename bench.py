"""Benchmark: TRIS-TPU throughput on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"[, "extra"]}.

The reference publishes no throughput numbers (BASELINE.md) and this
environment has no CUDA GPU, so ``vs_baseline`` reports the ratio against
torch-CPU anchors measured from the reference code itself
(tools/measure_torch_baseline.py, recorded in BASELINE.json under
``published.*`` with provenance), else null.

The default (infer) line carries an ``extra`` sub-object with the most recent
measured numbers of the OTHER modes (from BENCH_EXTRA.json, refreshed by
``TRIS_BENCH_MODE=all`` or any single-mode run) so one driver run pins the
whole mode matrix, not just inference.

Every mode runs a SINGLE-device program (no mesh), so the reported
"*/sec/chip" is that one device's rate — other chips of a multi-chip host
idle and are deliberately not averaged in. Multi-chip scaling is exercised
by __graft_entry__.dryrun_multichip and the mesh/CLI tests instead.

Env knobs:
  TRIS_BENCH_BATCH   (default 128; train modes 48; eval 128, prms 64)
  TRIS_BENCH_SIZE    (default 320; insseg 512)
  TRIS_BENCH_DTYPE   (default bf16; 'f32' for full precision)
  TRIS_BENCH_ITERS   (default 100; train modes 50; insseg 4)
  TRIS_BENCH_MODE    'infer' (default) stage-1 eval forward
                     'train'  full stage-1 training step incl. frozen-critic
                              losses + AdamW (train_stage1.py:301-372)
                     'train2' stage-2 training step: 4-side-output BCE +
                              EMA mean-teacher + AdamW (train_stage2.py:290-332)
                     'eval'   multi-sentence eval forward (response_maps,
                              trunk shared across sentences; validate.py:173-179)
                     'prms'   fused PRMS program — S model forwards + SxS
                              critic scores per ref (validate.py:311-328)
                     'insseg' IRNet pseudo-mask device stage: EdgeDisplacement
                              forward + centroid scan + random-walk
                              propagation (make_ins_seg_labels.py:126-158,
                              indexing.py:141-166 — the reference's heaviest op)
                     'all'    run every mode, refresh BENCH_EXTRA.json, print
                              the infer line with all modes in "extra"
  TRIS_BENCH_SENTS   (eval/prms: sentences per ref bucket, default 4)
  TRIS_BENCH_EMA     (train2: '1' EMA teacher on (default), '0' off)
  TRIS_BENCH_CHAIN   (train/train2/eval/prms: batches per dispatch, default 8 for
                     eval/prms, 1 for train. Through the axon relay the fixed
                     per-dispatch overhead (~5-10 ms) dominates the short
                     eval/prms programs (~12 ms device time) even at 100
                     iterations; chaining K batches into one program via
                     lax.scan — EVERY batch component (images, token ids,
                     valid masks, pseudo-masks) differs per scan step and is
                     threaded as scan xs, so nothing is loop-invariant and
                     XLA's while-loop LICM cannot hoist the text towers or
                     any other subcomputation out of the chain — makes the
                     wall clock measure the chip, which is what a
                     directly-attached production host sees. Set to 1 to
                     measure the per-dispatch path instead.)
"""

from __future__ import annotations

import functools
import json
import os
import time

REPO = os.path.dirname(os.path.abspath(__file__))
EXTRA_PATH = os.path.join(REPO, "BENCH_EXTRA.json")

_BASELINE_KEYS = {
    "infer": "pytorch_images_per_sec",
    "train": "pytorch_train_images_per_sec",
    "train2": "pytorch_train2_images_per_sec",
    "eval": "pytorch_eval_refs_per_sec",
    "prms": "pytorch_prms_refs_per_sec",
    "insseg": "pytorch_insseg_images_per_sec",
}


def _vs_baseline(mode: str, value: float):
    try:
        with open(os.path.join(REPO, "BASELINE.json")) as f:
            published = json.load(f).get("published", {})
        ref = published.get(_BASELINE_KEYS.get(mode, ""))
        if ref:
            return value / float(ref)
    except Exception:
        pass
    return None


def _result(mode: str, metric: str, value: float, unit: str) -> dict:
    return {
        "metric": metric,
        "value": round(value, 2),
        "unit": unit,
        "vs_baseline": _vs_baseline(mode, value),
    }


def _update_extra(results: dict) -> None:
    """Record per-mode results (with a timestamp) for the default line's
    ``extra`` sub-object."""
    data = {}
    try:
        with open(EXTRA_PATH) as f:
            data = json.load(f)
    except Exception:
        pass
    stamp = time.strftime("%Y-%m-%d")
    for mode, res in results.items():
        data[mode] = dict(res, measured=stamp)
    # refresh ratios of modes NOT re-measured this run: a baseline anchor may
    # have been recorded after the mode's last measurement (vs_baseline is
    # pure arithmetic on the recorded value and the anchor)
    for mode, res in data.items():
        if mode not in results and res.get("vs_baseline") is None and "value" in res:
            res["vs_baseline"] = _vs_baseline(mode, res["value"])
    with open(EXTRA_PATH, "w") as f:
        json.dump(data, f, indent=2)
        f.write("\n")


def _chain_loop(run, args, iters) -> float:
    """One timed pass: `iters` async chained dispatches + a single value
    fetch that depends on all of them. Returns elapsed seconds."""
    import jax.numpy as jnp

    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(iters):
        acc = acc + run(*args)
    float(acc)
    return time.perf_counter() - t0


def _best_of(timed, repeats: int = 3) -> float:
    """Best (min) elapsed time over `repeats` passes. The axon relay's
    per-dispatch latency fluctuates by >10x across minutes (measured PRMS
    swings 130-1368 refs/s run-to-run with identical programs); the fastest
    pass is the closest observable estimate of the chip-bound truth, which
    is what a directly-attached host sees. On direct-attach hardware the
    passes agree and this is a no-op."""
    repeats = int(os.environ.get("TRIS_BENCH_REPEATS", repeats))
    return min(timed() for _ in range(repeats))


def _load_extra() -> dict:
    try:
        with open(EXTRA_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _random_word_ids(key, shape):
    """Distinct, well-formed token batches: random vocab ids with BOS/EOS in
    place. Varying the ids per chained scan step keeps the text towers from
    being loop-hoisted (they would be loop-invariant with constant ids)."""
    import jax
    import jax.numpy as jnp

    ids = jax.random.randint(key, shape, 1000, 40000, jnp.int32)
    ids = ids.at[..., 0].set(49406)
    ids = ids.at[..., 2:].set(0)
    return ids.at[..., 2].set(49407)


def main() -> None:
    mode = os.environ.get("TRIS_BENCH_MODE", "infer")
    fns = {
        "infer": bench_infer,
        "train": bench_train,
        "train2": bench_train2,
        "eval": bench_eval,
        "prms": bench_prms,
        "insseg": bench_insseg,
        "irntrain": bench_irntrain,
    }
    if mode == "all":
        results = {}
        for m, fn in fns.items():
            results[m] = fn()
        _update_extra(results)
        out = dict(results["infer"])
        out["extra"] = {m: r for m, r in results.items() if m != "infer"}
        print(json.dumps(out))
        return
    res = fns[mode]()
    _update_extra({mode: res})
    if mode == "infer":
        extra = {m: r for m, r in _load_extra().items() if m != "infer"}
        if extra:
            res = dict(res, extra=extra)
    print(json.dumps(res))


def bench_infer() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tris_tpu.models.stage1 import Stage1Config, TRISStage1

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

    ips_per_chip = batch * iters / dt
    return _result("infer", "stage1_rn50_320px_inference_throughput_per_chip",
                   ips_per_chip, "images/sec/chip")


def bench_train() -> dict:
    """Full stage-1 training step throughput (model fwd/bwd + frozen ViT-B/32
    critic losses + per-group AdamW update)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tris_tpu.models.clip import CLIP, CLIP_CONFIGS
    from tris_tpu.models.stage1 import Stage1Config, TRISStage1
    from tris_tpu.train.stage1 import Stage1LossWeights, make_train_step
    from tris_tpu.train.state import create_train_state

    batch = int(os.environ.get("TRIS_BENCH_BATCH", 48))
    size = int(os.environ.get("TRIS_BENCH_SIZE", 320))
    iters = int(os.environ.get("TRIS_BENCH_ITERS", 50))
    chain = int(os.environ.get("TRIS_BENCH_CHAIN", 1))
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
    step = make_train_step(model, critic, Stage1LossWeights(), donate=True, chain=chain)
    if chain > 1:
        # chain>1 contract: leading [chain] axis, one DISTINCT batch per scan
        # step (images AND token ids) so nothing is loop-invariant
        k1, k2, k3 = jax.random.split(key, 3)
        bt = {
            "image": jax.random.normal(k1, (chain, batch, size, size, 3), jnp.float32),
            "word_ids": _random_word_ids(k2, (chain, batch, 20)),
            "neg_word_ids": _random_word_ids(k3, (chain, batch, negatives, 20)),
        }
        iters = max(5, iters // chain)
    else:
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
    return _result("train", "stage1_rn50_320px_train_step_throughput_per_chip",
                   batch * iters * chain / dt, "images/sec/chip")


def bench_train2() -> dict:
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
    chain = int(os.environ.get("TRIS_BENCH_CHAIN", 1))

    model = TRISStage2(Stage2Config(), dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((batch, size, size, 3), jnp.float32)
    ids = jnp.zeros((batch, 20), jnp.int32).at[:, 0].set(49406).at[:, 2].set(49407)
    variables = jax.jit(lambda k: model.init(k, img, ids, train=True))(key)
    use_ema = os.environ.get("TRIS_BENCH_EMA", "1") == "1"
    state = create_train_state(model, variables, total_steps=10 ** 6, stage="stage2",
                               with_ema=use_ema)
    step = make_train_step(model, Stage2TrainConfig(use_ema=use_ema), chain=chain)
    if chain > 1:
        # chain>1 contract: one DISTINCT batch per scan step (see bench_train)
        k1, k2, k3 = jax.random.split(key, 3)
        bt = {
            "image": jax.random.normal(k1, (chain, batch, size, size, 3), jnp.float32),
            "word_ids": _random_word_ids(k2, (chain, batch, 20)),
            "pseudo": (jax.random.uniform(k3, (chain, batch, size, size, 1)) > 0.5)
            .astype(jnp.float32),
        }
        iters = max(5, iters // chain)
    else:
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
    return _result("train2", "stage2_rn50_320px_train_step_throughput_per_chip",
                   batch * iters * chain / dt, "images/sec/chip")


def bench_eval() -> dict:
    """Multi-sentence eval forward throughput (refs/s): one shared image-trunk
    pass + S per-sentence text/fusion/head passes per ref
    (eval/validate.py::make_eval_forward). The reference runs S separate
    batch-1 full forwards per ref (validate.py:173-179)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tris_tpu.eval.validate import make_eval_forward
    from tris_tpu.models.stage1 import Stage1Config, TRISStage1

    batch = int(os.environ.get("TRIS_BENCH_BATCH", 128))  # sweep: 3117 refs/s @16 -> 4003 @128 on v5e
    sents = int(os.environ.get("TRIS_BENCH_SENTS", 4))    # bucketed S
    size = int(os.environ.get("TRIS_BENCH_SIZE", 320))
    # short per-iter programs need many iterations to amortize the relayed
    # runtime's fixed per-run dispatch overhead (PERF_NOTES: 180 -> 930
    # refs/s on PRMS going from 10 to 150 iters; device trace says ~12 ms/batch)
    iters = int(os.environ.get("TRIS_BENCH_ITERS", 100))

    chain = int(os.environ.get("TRIS_BENCH_CHAIN", 8))

    model = TRISStage1(Stage1Config(), dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    image = jax.random.normal(key, (batch, size, size, 3), jnp.float32)
    ids = np.zeros((batch, sents, 20), np.int32)
    ids[..., 0], ids[..., 1], ids[..., 2] = 49406, 786, 49407
    ids = jnp.asarray(ids)
    variables = jax.jit(lambda k: model.init(k, image, ids[:, 0], train=False))(key)
    forward = make_eval_forward(model)

    if chain > 1:
        # one dispatch = `chain` DIFFERENT batches through a lax.scan. Images
        # AND token ids are scan xs and distinct per step — with constant ids
        # the text tower would be loop-invariant and XLA's LICM could hoist
        # it out of the chain, overstating the per-ref rate (real eval has
        # fresh sentences every batch).
        k1, k2 = jax.random.split(key)
        images = jax.random.normal(k1, (chain, batch, size, size, 3), jnp.float32)
        idsc = _random_word_ids(k2, (chain, batch, sents, 20))
        jax.block_until_ready((images, idsc))

        @jax.jit
        def run(variables, images, idsc):
            def body(acc, xs):
                img, ids = xs
                out = model.apply(variables, img, ids, method="response_maps")
                return acc + out.astype(jnp.float32).mean(), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (images, idsc))
            return acc

        iters = max(10, iters // chain)  # chain already amortizes dispatch
        # compile + several warm executions: through the relay the first few
        # executions of a fresh program run far below steady state (measured
        # 165 ms/batch on the first timed run vs 5.4 steady)
        for _ in range(3):
            float(run(variables, images, idsc))
        dt = _best_of(lambda: _chain_loop(run, (variables, images, idsc), iters))
        return _result("eval", f"eval_rn50_{size}px_S{sents}_refs_per_sec_per_chip",
                       batch * chain * iters / dt, "refs/sec/chip")

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
    return _result("eval", f"eval_rn50_{size}px_S{sents}_refs_per_sec_per_chip",
                   batch * iters / dt, "refs/sec/chip")


def bench_prms() -> dict:
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

    batch = int(os.environ.get("TRIS_BENCH_BATCH", 64))   # sweep: 1391 refs/s @16 -> 1494 @64, regresses @96+ on v5e
    sents = int(os.environ.get("TRIS_BENCH_SENTS", 4))    # bucketed S
    size = int(os.environ.get("TRIS_BENCH_SIZE", 320))
    iters = int(os.environ.get("TRIS_BENCH_ITERS", 100))  # see bench_eval note
    chain = int(os.environ.get("TRIS_BENCH_CHAIN", 8))

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

    if chain > 1:
        # see bench_eval: K distinct batches per dispatch — images, token ids
        # AND valid masks all vary per scan step (constant ids would let LICM
        # hoist the model text tower and the critic's S text encodes)
        k1, k2 = jax.random.split(key)
        images = jax.random.normal(k1, (chain, batch, size, size, 3), jnp.float32)
        idsc = _random_word_ids(k2, (chain, batch, sents, 20))
        validc = jnp.ones((chain, batch, sents), bool)
        jax.block_until_ready((images, idsc))

        @jax.jit
        def run(variables, critic_vars, images, idsc, validc):
            def body(acc, xs):
                img, ids, valid = xs
                _, _, scores = forward(variables, critic_vars, img, ids, valid)
                return acc + jnp.where(jnp.isfinite(scores), scores, 0.0).sum(), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (images, idsc, validc))
            return acc

        iters = max(10, iters // chain)  # chain already amortizes dispatch
        for _ in range(3):  # compile + warm to steady state (see bench_eval)
            float(run(variables, critic_vars, images, idsc, validc))
        dt = _best_of(
            lambda: _chain_loop(run, (variables, critic_vars, images, idsc, validc), iters))
        return _result("prms", f"prms_rn50_{size}px_S{sents}_refs_per_sec_per_chip",
                       batch * chain * iters / dt, "refs/sec/chip")

    best, cams, scores = forward(variables, critic_vars, image, ids, valid)
    float(scores.sum())  # compile + sync
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(iters):
        best, cams, scores = forward(variables, critic_vars, image, ids, valid)
        acc = acc + scores.sum()
    float(acc)
    dt = time.perf_counter() - t0
    return _result("prms", f"prms_rn50_{size}px_S{sents}_refs_per_sec_per_chip",
                   batch * iters / dt, "refs/sec/chip")


def bench_insseg() -> dict:
    """IRNet pseudo-mask device stage, per image (make_ins_seg_labels.py:126-158):
    EdgeDisplacement forward (image + hflip through the frozen R50 trunk),
    300-iteration centroid-refinement scan, host centroid clustering, and the
    random-walk propagation — 8 squarings of the dense [HW/16, HW/16]
    transition matrix, the reference's single heaviest op
    (indexing.py:141-166). Shapes follow the IRNet recipe: 512px input,
    stride-4 grid (128x128 -> 16384^2 dense matmuls, ~70 TFLOP/image).

    Pipelined like the production pass (pseudo/pipeline.py::_ins_seg_worker):
    image k+1's device programs are DISPATCHED before image k's host
    clustering runs, so host CC and device matmuls overlap instead of
    serializing (jax dispatch is async). Per iteration only small stride-4
    grids cross the link (centroids/disp ~128 KB for clustering; the walk is
    reduced to a device scalar) — <10% of the walk's device time even through
    the ~12 MB/s relay. The torch anchor for this stage is impractical on CPU
    (~70 TFLOP/image dense matmuls), so vs_baseline stays null unless
    BASELINE.json carries a GPU-side number."""
    import collections

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tris_tpu.pseudo.irnet import IRNet, edge_displacement_infer
    from tris_tpu.pseudo.labels import _refine_centroids, cluster_centroids
    from tris_tpu.pseudo.indexing import propagate_to_edge_bucketed

    size = int(os.environ.get("TRIS_BENCH_SIZE", 512))
    iters = int(os.environ.get("TRIS_BENCH_ITERS", 8))

    model = IRNet()
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k: model.init(k, jnp.zeros((2, size, size, 3))))(key)

    def dispatch(img, cam):
        """S1: edge/displacement inference + centroid scan (device, async)."""
        edge, disp = edge_displacement_infer(model, variables, img)
        return edge, disp, _refine_centroids(disp), cam

    def walk(edge, disp, cents, cam):
        """S2: host CC on the fetched stride-4 grids, then the random-walk
        dispatch; returns a device scalar depending on the whole walk."""
        inst = cluster_centroids(np.asarray(cents), np.asarray(disp))  # host CC
        inst_cam = cam[None] * jnp.asarray(inst, jnp.float32)          # device
        rw = propagate_to_edge_bucketed(inst_cam, edge)
        return rw.astype(jnp.float32).sum()

    n_inputs = 2
    imgs = [jax.random.normal(k, (size, size, 3), jnp.float32)
            for k in jax.random.split(key, n_inputs)]
    cams = [jax.random.uniform(k, (size // 4, size // 4), jnp.float32)
            for k in jax.random.split(jax.random.PRNGKey(7), n_inputs)]
    jax.block_until_ready((imgs, cams))
    float(walk(*dispatch(imgs[0], cams[0])))  # compile + warm every program

    def timed():
        t0 = time.perf_counter()
        pending: collections.deque = collections.deque()
        acc = jnp.zeros(())
        for i in range(iters):
            pending.append(dispatch(imgs[i % n_inputs], cams[i % n_inputs]))
            if len(pending) > 1:  # one-deep pipeline, as the production pass
                acc = acc + walk(*pending.popleft())
        while pending:
            acc = acc + walk(*pending.popleft())
        assert np.isfinite(float(acc))  # forces completion of every image
        return time.perf_counter() - t0

    dt = _best_of(timed)
    return _result("insseg", f"insseg_irnet_{size}px_images_per_sec_per_chip",
                   iters / dt, "images/sec/chip")


def bench_irntrain() -> dict:
    """IRNet affinity/displacement training step (train_irn.py:33-93): frozen
    R50 trunk forward/backward at crop 512, path-indexed affinity + masked
    displacement losses over PathIndex(radius=10) pairs, SGD with the
    displacement head at 10x LR. Reference recipe: global bs 96 over 4 GPUs =
    24/device (TRIS_BENCH_BATCH overrides).

    This is the DEVICE half of the measurement; the host half (the threaded
    PIL augment + affinity-label loader, pseudo/pipeline.py::irn_train_batches)
    is measured by tools/irn_feed_experiments.py — together they decide
    host- vs device-bound (VERDICT r3 weak #3). Labels are synthesized on
    device (the same math as pseudo/aug.py::affinity_labels_from_indices on a
    random quarter-scale label map), so shapes and sparsity match production;
    values don't affect timing (dense masked reductions). Chain mode
    (TRIS_BENCH_CHAIN) scans over distinct per-step batches as in the
    stage-1/2 trainers."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tris_tpu.pseudo.indexing import PathIndex
    from tris_tpu.pseudo.irnet import IRNet
    from tris_tpu.pseudo.train_irn import (
        IRNTrainConfig,
        create_irn_state,
        make_irn_train_step,
    )

    batch = int(os.environ.get("TRIS_BENCH_BATCH", 24))
    size = int(os.environ.get("TRIS_BENCH_SIZE", 512))
    iters = int(os.environ.get("TRIS_BENCH_ITERS", 20))
    # the step is heavy (bs-24 fwd/bwd at 512px) so dispatch overhead is a
    # small fraction; a chained batch holds images (~3 MB/example f32) plus
    # 16 KB label maps, so chain=2 keeps the resident batch modest
    chain = int(os.environ.get("TRIS_BENCH_CHAIN", 2))

    path_index = PathIndex(10, (size // 4, size // 4))
    model = IRNet()
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k: model.init(k, jnp.zeros((2, size, size, 3))))(key)
    tcfg = IRNTrainConfig(crop_size=size, batch_size=batch)
    state = create_irn_state(model, variables, tcfg, max_step=10 ** 6)
    step = make_irn_train_step(model, path_index, donate=True)

    # production feed (round 5): a random {bg, fg, ignore} quarter-scale
    # label map per example; the step itself builds the pair masks on device
    # (train_irn.py::affinity_labels_on_device — so the bench times the
    # in-step label build too). Host-mask tensors are ~24 MB/example, far too
    # big to push through the relay, which is exactly why the production
    # feed ships the 16 KB map instead.
    def mk_batch(k, lead=()):
        k1, k2 = jax.random.split(k)
        shape = (*lead, batch)

        @jax.jit
        def build(k1, k2):
            u = jax.random.uniform(k1, (*shape, size // 4, size // 4))
            lab = jnp.where(u < 0.45, 0, jnp.where(u < 0.80, 1, 255)).astype(jnp.int32)
            return {
                "image": jax.random.normal(k2, (*shape, size, size, 3), jnp.float32),
                "reduced_label": lab,
            }

        return build(k1, k2)

    if chain > 1:
        # scan over the raw step body (the jitted step can't be scanned);
        # distinct per-step batches as in bench_train
        import optax

        from tris_tpu.pseudo.train_irn import irn_loss

        def body(s, b):
            (_, metrics), grads = jax.value_and_grad(irn_loss, has_aux=True)(
                s.params, s.batch_stats, model, path_index, b)
            updates, new_opt = s.tx.update(grads, s.opt_state, s.params)
            new_params = optax.apply_updates(s.params, updates)
            return s.replace(step=s.step + 1, params=new_params, opt_state=new_opt), metrics

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(s, batches):
            s, ms = jax.lax.scan(body, s, batches)
            return s, jax.tree_util.tree_map(lambda x: x[-1], ms)

        bt = mk_batch(key, lead=(chain,))
        iters = max(2, iters // chain)
        state, m = run(state, bt)
        float(m["loss"])  # compile + sync
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = run(state, bt)
        float(m["loss"])
        dt = time.perf_counter() - t0
        n_img = batch * chain * iters
    else:
        bt = mk_batch(key)
        state, m = step(state, bt)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, bt)
        float(m["loss"])
        dt = time.perf_counter() - t0
        n_img = batch * iters
    return _result("irntrain", f"irntrain_r50_{size}px_images_per_sec_per_chip",
                   n_img / dt, "images/sec/chip")


if __name__ == "__main__":
    main()
