"""Decompose the IRNet forward cost on the real chip (round 5).

The stage-1 CLIP-RN50 eval forward runs at ~0.24 ms/img@320px (bench infer),
yet `edge_displacement_infer` measures ~16 ms/img@512px — ~20x off the
FLOP-scaled expectation, and the bf16-trunk A/B moved it only 1.05x, so the
trunk's convs are NOT the bottleneck. This times each piece as its own jitted
program to find where the milliseconds actually go:

  trunk      ResNet50Trunk.apply (stem + 4 stages, strides 2,2,2,1)
  irnet      full IRNet.apply (trunk + 5 edge taps + 7 dp taps + fuses)
  edgedisp   edge_displacement_infer (2-image flip stack + averaging)

each in f32 and with trunk_dtype=bf16, plus a heads-only estimate
(irnet - trunk). Run: python tools/irnet_profile.py [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, reps=5):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    from tris_tpu.pseudo.irnet import IRNet, ResNet50Trunk, edge_displacement_infer

    rng = np.random.default_rng(0)
    img2 = jnp.asarray(rng.standard_normal((2, size, size, 3)), jnp.float32)
    img1 = jnp.asarray(rng.standard_normal((size, size, 3)), jnp.float32)

    full = IRNet()
    variables = jax.jit(lambda k: full.init(k, jnp.zeros((2, size, size, 3))))(
        jax.random.PRNGKey(0))
    trunk_vars = {"params": variables["params"]["trunk"],
                  "batch_stats": variables["batch_stats"]["trunk"]}

    for label, dt in [("f32", None), ("bf16", jnp.bfloat16)]:
        trunk = ResNet50Trunk(dtype=dt or jnp.float32)
        model = IRNet(trunk_dtype=dt)

        @jax.jit
        def trunk_fwd(v, x):
            return trunk.apply(v, x)[-1].astype(jnp.float32)

        @jax.jit
        def irnet_fwd(v, x):
            e, d = model.apply(v, x)
            return e.astype(jnp.float32), d.astype(jnp.float32)

        def run_trunk():
            return float(trunk_fwd(trunk_vars, img2).mean())

        def run_irnet():
            e, d = irnet_fwd(variables, img2)
            return float(e.mean())

        def run_ed():
            e, d = edge_displacement_infer(model, variables, img1)
            return float(jnp.asarray(e).mean())

        t_t = timeit(run_trunk)
        t_i = timeit(run_irnet)
        t_e = timeit(run_ed)
        print(f"{label}: trunk(2x{size}) {t_t * 1e3:7.1f} ms | full irnet "
              f"{t_i * 1e3:7.1f} ms (heads ~{(t_i - t_t) * 1e3:.1f}) | "
              f"edge_disp {t_e * 1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
