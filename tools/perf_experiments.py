"""Round-2 TPU perf experiments for stage-1 inference (VERDICT item 3).

Each experiment times the stage-1 eval forward at 320px bf16 and prints
img/s/chip. Run on the real TPU: python tools/perf_experiments.py [names...]

Findings land in docs/PERF_NOTES.md.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tris_tpu.models.stage1 import Stage1Config, TRISStage1


def make_inputs(batch, size, img_dtype=jnp.float32):
    rng = np.random.default_rng(0)
    word_ids = np.zeros((batch, 20), np.int32)
    word_ids[:, 0], word_ids[:, 1], word_ids[:, 2] = 49406, 786, 49407
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    images = [jax.random.normal(k, (batch, size, size, 3), img_dtype) for k in keys]
    jax.block_until_ready(images)
    return images, jnp.asarray(word_ids)


def time_forward(forward, variables, images, word_ids, batch, iters=20):
    @jax.jit
    def step_checksum(acc, out):
        return acc + out.astype(jnp.float32).mean()

    acc = jnp.zeros((), jnp.float32)
    acc = step_checksum(acc, forward(variables, images[0], word_ids))
    acc = step_checksum(acc, forward(variables, images[1], word_ids))
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for i in range(iters):
        acc = step_checksum(acc, forward(variables, images[i % len(images)], word_ids))
    float(acc)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def build(batch=128, size=320):
    model = TRISStage1(Stage1Config(), dtype=jnp.bfloat16)
    images, word_ids = make_inputs(batch, size)
    variables = jax.jit(lambda k: model.init(k, images[0], word_ids, train=False))(
        jax.random.PRNGKey(0)
    )
    return model, variables, images, word_ids


def exp_baseline(batch=128):
    model, variables, images, word_ids = build(batch)

    @jax.jit
    def forward(v, img, ids):
        return model.apply(v, img, ids, train=False)

    ips = time_forward(forward, variables, images, word_ids, batch)
    print(f"baseline B={batch}: {ips:.0f} img/s")


def exp_batch_sweep():
    for b in (64, 128, 256, 512):
        exp_baseline(b)


def exp_bf16_input(batch=128):
    model, variables, _, word_ids = build(batch)
    images, _ = make_inputs(batch, 320, jnp.bfloat16)

    @jax.jit
    def forward(v, img, ids):
        return model.apply(v, img, ids, train=False)

    ips = time_forward(forward, variables, images, word_ids, batch)
    print(f"bf16-input B={batch}: {ips:.0f} img/s")


def exp_compiler_flags(batch=128):
    """Try XLA compiler options aimed at layout/fusion decisions."""
    model, variables, images, word_ids = build(batch)

    def fwd(v, img, ids):
        return model.apply(v, img, ids, train=False)

    option_sets = {
        "vmem_128M": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
        "no_multi_level_fusion": {"xla_tpu_enable_multi_level_nested_loop_fusion": "false"},
        "no_bitcast_opt": {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "false"},
        "dot_dot": {"xla_tpu_enable_dot_strength_reduction": "false"},
        "flm_cost_model": {"xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"},
    }
    for name, opts in option_sets.items():
        try:
            compiled = (
                jax.jit(fwd)
                .lower(variables, images[0], word_ids)
                .compile(compiler_options=opts)
            )

            def forward(v, img, ids, c=compiled):
                return c(v, img, ids)

            ips = time_forward(forward, variables, images, word_ids, batch)
            print(f"flags[{name}]: {ips:.0f} img/s")
        except Exception as e:  # noqa: BLE001
            print(f"flags[{name}]: rejected ({str(e)[:90]})")


def exp_hlo_dump(batch=128):
    """Dump optimized HLO and report where bitcast/copy fusions sit."""
    model, variables, images, word_ids = build(batch)

    def fwd(v, img, ids):
        return model.apply(v, img, ids, train=False)

    txt = jax.jit(fwd).lower(variables, images[0], word_ids).compile().as_text()
    with open("/tmp/stage1_fwd_hlo.txt", "w") as f:
        f.write(txt)
    import re

    kinds = {}
    for m in re.finditer(r"fusion\(", txt):
        pass
    for line in txt.splitlines():
        if "kind=" in line and "fusion" in line:
            kind = re.search(r"kind=(\w+)", line)
            if kind:
                kinds[kind.group(1)] = kinds.get(kind.group(1), 0) + 1
    n_copy = txt.count(" copy(")
    n_bitcast = txt.count(" bitcast(")
    n_transpose = txt.count(" transpose(")
    print("fusion kinds:", kinds)
    print(f"copies: {n_copy}  bitcasts: {n_bitcast}  transposes: {n_transpose}")
    print("HLO written to /tmp/stage1_fwd_hlo.txt")


EXPERIMENTS = {
    "baseline": exp_baseline,
    "sweep": exp_batch_sweep,
    "bf16in": exp_bf16_input,
    "flags": exp_compiler_flags,
    "hlo": exp_hlo_dump,
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["baseline"]
    for n in names:
        EXPERIMENTS[n]()
