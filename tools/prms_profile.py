"""Per-op device-time breakdown of the fused PRMS program.

Builds the same program as bench.py's prms mode (B=16 refs, S=4 sentences,
320px, bf16 compute) and aggregates a jax.profiler trace by HLO op via
tools.profile_ops. Run on the real chip:

    python -m tools.prms_profile [top]
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp

from tris_tpu.models.clip import CLIP, CLIP_CONFIGS
from tris_tpu.models.stage1 import Stage1Config, TRISStage1
from tris_tpu.eval.validate import make_prms_forward
from tools.profile_ops import profile_top_ops


def main() -> None:
    top = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    batch, sents, size = 16, 4, 320

    model = TRISStage1(Stage1Config(), dtype=jnp.bfloat16)
    critic = CLIP(dataclasses.replace(CLIP_CONFIGS["ViT-B-32"], txt_length=20),
                  dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    image = jax.random.normal(key, (batch, size, size, 3), jnp.float32)
    ids = jnp.zeros((batch, sents, 20), jnp.int32)
    ids = ids.at[:, :, 0].set(49406).at[:, :, 1].set(786).at[:, :, 2].set(49407)
    valid = jnp.ones((batch, sents), bool)

    variables = jax.jit(lambda k: model.init(k, image, ids[:, 0], train=False))(key)
    critic_vars = jax.jit(
        lambda k: critic.init(k, jnp.zeros((1, 224, 224, 3)), ids[:1, 0]))(key)

    forward = make_prms_forward(model, critic)

    def run():
        best, cams, scores = forward(variables, critic_vars, image, ids, valid)
        jax.block_until_ready(scores)

    run()  # compile
    run()  # warm
    profile_top_ops(run, iters=10, top=top)


if __name__ == "__main__":
    main()
