"""A/B the IRNet trunk's compute dtype (f32 vs bf16) on the real chip.

VERDICT r4 next-#3: the ins_seg device budget is ~500 ms/img of which 53 ms
is the EdgeDisplacement forward; a bf16 trunk halves its HBM traffic and
doubles its MXU rate, but adoption is gated — like every prior precision
adoption (bf16 walk, banded squarings) — on FINAL instance-label agreement
through the full per-image pipeline (forward -> centroid refinement -> host
CCL clustering -> bucketed walk -> upsample/argmax), not on activation
deltas.

Prints per-image label agreement + edge/disp deltas + forward timing for
both dtypes. Run: python tools/irn_trunk_dtype_ab.py [n_images]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

SIZE = 512


def smooth(rng, shape, zoom):
    from scipy import ndimage

    small = rng.standard_normal([-(-s // zoom) for s in shape]).astype(np.float32)
    out = ndimage.zoom(small, [s / ss for s, ss in zip(shape, small.shape)], order=1)
    return out


def label_path(model, variables, img, cam):
    from tris_tpu.pseudo.irnet import edge_displacement_infer
    from tris_tpu.pseudo.labels import (
        _refine_centroids,
        cluster_centroids,
        walk_upsample_argmax,
    )

    edge, disp = edge_displacement_infer(model, variables, img)
    cents = _refine_centroids(disp)
    inst = cluster_centroids(np.asarray(cents), np.asarray(disp))
    rw_up, shape = walk_upsample_argmax(inst, cam, edge, (SIZE, SIZE))
    return np.asarray(shape), np.asarray(edge), np.asarray(disp)


def time_forward(model, variables, img, reps=5):
    from tris_tpu.pseudo.irnet import edge_displacement_infer

    def run():
        e, d = edge_displacement_infer(model, variables, img)
        return float(jnp.asarray(e).mean())  # relay-safe sync

    run()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from tris_tpu.pseudo.irnet import IRNet

    rng = np.random.default_rng(0)
    m32 = IRNet()
    mbf = IRNet(trunk_dtype=jnp.bfloat16)
    variables = jax.jit(lambda k: m32.init(k, jnp.zeros((2, SIZE, SIZE, 3))))(
        jax.random.PRNGKey(0))

    agrees, d_edges, d_disps = [], [], []
    for i in range(n):
        img = jnp.asarray(smooth(rng, (SIZE, SIZE, 3), 8), jnp.float32)
        cam = np.clip(smooth(rng, (SIZE, SIZE), 16), 0, None).astype(np.float32)
        s32, e32, dp32 = label_path(m32, variables, img, cam)
        sbf, ebf, dpbf = label_path(mbf, variables, img, cam)
        agree = float((s32 == sbf).mean())
        agrees.append(agree)
        d_edges.append(float(np.abs(e32 - ebf).max()))
        d_disps.append(float(np.abs(dp32 - dpbf).max()))
        print(f"img {i}: label agree {agree:.6f}  max|d_edge| {d_edges[-1]:.2e}"
              f"  max|d_disp| {d_disps[-1]:.2e}", flush=True)

    img = jnp.asarray(smooth(rng, (SIZE, SIZE, 3), 8), jnp.float32)
    t32 = time_forward(m32, variables, img)
    tbf = time_forward(mbf, variables, img)
    print(f"\nforward f32 : {t32 * 1e3:7.1f} ms")
    print(f"forward bf16: {tbf * 1e3:7.1f} ms  ({t32 / tbf:.2f}x)")
    print(f"label agreement: mean {np.mean(agrees):.6f} min {np.min(agrees):.6f}")


if __name__ == "__main__":
    main()
