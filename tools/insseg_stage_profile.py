"""Per-stage device timing of the ins_seg pass at the 512px bucket.

Splits the ~750 ms/img single-chip time (TRIS_BENCH_MODE=insseg) into its
three device programs — EdgeDisplacement forward, the 300-iteration centroid
refinement scan, and the bucketed random walk — to decide where the remaining
headroom is (docs/ROADMAP.md known-gap #4). Synchronizes by fetching a
value that depends on the result (relay gotcha, CLAUDE.md).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from tris_tpu.pseudo.irnet import IRNet, edge_displacement_infer
from tris_tpu.pseudo.labels import _refine_centroids
from tris_tpu.pseudo.indexing import propagate_to_edge_bucketed

SIZE = 512
GRID = SIZE // 4
K = 16
REPS = 5


def sync(x):
    return float(jnp.asarray(x).mean().block_until_ready())


def timeit(label, fn):
    fn()  # warmup/compile
    sync(fn())
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best * 1000:8.1f} ms")
    return best


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((SIZE, SIZE, 3)), jnp.float32)
    model = IRNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)))
    variables = jax.device_put(variables)

    edge, disp = edge_displacement_infer(model, variables, img)
    edge = jnp.asarray(np.asarray(edge))  # materialized copies for the later stages
    disp = jnp.asarray(np.asarray(disp))
    x = jnp.asarray(rng.random((K, GRID, GRID)), jnp.float32)

    t_fwd = timeit("edge_disp forward (2x flip)", lambda: edge_displacement_infer(model, variables, img)[0])
    t_cent = timeit("centroid scan (300 it)", lambda: _refine_centroids(disp))
    t_walk = timeit("bucketed walk", lambda: propagate_to_edge_bucketed(x, edge, radius=5))
    print(f"{'device total':28s} {(t_fwd + t_cent + t_walk) * 1000:8.1f} ms")


if __name__ == "__main__":
    main()
