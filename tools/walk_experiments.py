"""A/B experiments for the random-walk propagation (pseudo/indexing.py).

The walk computes ``rw = x @ T^(2^e)`` (e=8). The reference (and round-3
rebuild) materializes T^(2^e) by e dense squarings — 9 [n,n] matmuls, FLOP
bound at ~2n^3 each. Algebraically the same result is
``((x @ T^(2^k)) @ T^(2^k)) ...`` with k squarings and 2^(e-k) thin
[K,n]@[n,n] steps; the thin steps are HBM-bound (one T read each), so the
optimum k trades FLOPs for bandwidth. This script measures the k sweep and a
bf16-matmul variant on the real chip, and checks end-label agreement vs the
f32 full-squaring baseline.

Run: python tools/walk_experiments.py [grid_h grid_w]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def make_inputs(H, W, K=16, seed=0):
    rng = np.random.default_rng(seed)
    # realistic edge: smooth blobs in [0,1]
    edge = rng.random((H, W)).astype(np.float32)
    from scipy import ndimage

    edge = ndimage.gaussian_filter(edge, 5)
    edge = (edge - edge.min()) / (edge.max() - edge.min())
    x = (rng.random((K, H, W)) * (rng.random((K, 1, 1)) > 0.3)).astype(np.float32)
    return x, edge


def dense_affinity(edge, radius=5):
    from tris_tpu.pseudo.indexing import _walk_program  # reuse banded build

    # build through the production program's first half by calling the full
    # walk program is awkward; instead reconstruct the dense matrix directly
    from tris_tpu.pseudo import indexing as I

    H, W = edge.shape
    hor, ver = W + 2 * radius, H + radius
    pi = I._padded_path_index(radius, (ver, hor))
    ch = ver - pi.radius_floor
    cw = hor - 2 * pi.radius_floor
    woff = radius - pi.radius_floor
    dirs = np.asarray(pi.search_dst, np.int64)

    @jax.jit
    def build(edge):
        edge_padded = jnp.pad(edge, ((0, radius), (radius, radius)), constant_values=1.0)
        grids = []
        for ind in pi.path_indices:
            gathered = edge_padded.reshape(-1)[jnp.asarray(ind)]
            grids.append(1.0 - gathered.max(axis=1))
        aff_grids = jnp.concatenate(grids, axis=0).reshape(-1, ch, cw)
        return I._banded_dense_affinity(aff_grids, dirs, H, W, woff)

    return build(edge)


def variant(k_sq, dtype, beta=10.0, e=8, thin_hp=False, bandsq=0, max_off=0):
    """Build jitted walk tail: (dense_aff, x_flat) -> rw, with k_sq squarings
    then 2^(e-k_sq) thin steps, matmuls in `dtype` (normalize stays f32).
    ``thin_hp``: thin steps at f32 v + Precision.HIGHEST (they are HBM-bound
    on the T read, so the 6-pass cost is hidden; avoids compounding 2^(e-k)
    bf16 truncations of v)."""

    @jax.jit
    def run(dense, xf):
        scaled = jnp.power(dense, beta)
        trans = scaled / scaled.sum(axis=0, keepdims=True)
        trans = trans.astype(dtype)

        kb = bandsq
        if kb:
            from tris_tpu.pseudo.indexing import _block_banded_squarings

            trans = _block_banded_squarings(trans, max_off, kb, dtype)

        def sq(t, _):
            return (t @ t).astype(dtype), None

        trans, _ = jax.lax.scan(sq, trans, None, length=k_sq - kb)

        if thin_hp:
            tf = trans.astype(jnp.float32)

            def step(v, _):
                return jnp.matmul(v, tf, precision=jax.lax.Precision.HIGHEST), None

            v, _ = jax.lax.scan(step, xf, None, length=2 ** (e - k_sq))
            return v

        def step(v, _):
            return (v @ trans).astype(dtype), None

        v, _ = jax.lax.scan(step, xf.astype(dtype), None, length=2 ** (e - k_sq))
        return v.astype(jnp.float32)

    return run


def labels_from(rw, K, H, W, thres=0.25):
    m = rw.reshape(K, H, W)
    m = m / max(float(m.max()), 1e-12)
    padded = np.concatenate([np.full((1, H, W), thres, np.float32), m], 0)
    return np.argmax(padded, 0)


def main():
    H, W = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (128, 128)
    K = 16
    x, edge = make_inputs(H, W, K)
    dense = dense_affinity(jnp.asarray(edge))
    xf = jnp.asarray(x.reshape(K, -1) * (1.0 - edge.reshape(1, -1)))
    jax.block_until_ready((dense, xf))
    n = H * W
    print(f"grid {H}x{W} (n={n}), K={K}")

    ref_run = variant(8, jnp.float32)
    ref = np.asarray(ref_run(dense, xf))
    ref_labels = labels_from(ref, K, H, W)

    from tris_tpu.pseudo.indexing import _banded_sq_plan, _padded_path_index

    radius = 5
    pi = _padded_path_index(radius, (H + radius, W + 2 * radius))
    max_off = max(int(dy) * W + int(dx) for dy, dx in np.asarray(pi.search_dst, np.int64))
    kb_plan = _banded_sq_plan(n, max_off, 8)
    print(f"max_off={max_off}, banded squarings planned: {kb_plan}")

    variants = [("f32", 8, jnp.float32, False, 0),
                ("bf16", 8, jnp.bfloat16, False, 0),
                ("bf16+band", 8, jnp.bfloat16, False, kb_plan),
                ("bf16+hp", 2, jnp.bfloat16, True, 0),
                ("bf16+hp+band", 2, jnp.bfloat16, True, min(kb_plan, 2))]
    results = []
    for dname, k, dtype, thin_hp, kb in variants:
        run = variant(k, dtype, thin_hp=thin_hp, bandsq=kb, max_off=max_off)
        out = run(dense, xf)
        jax.block_until_ready(out)
        iters = 3
        t0 = time.perf_counter()
        # chain a scalar through every iteration: through the axon relay,
        # block_until_ready alone may return before remote execution finishes
        tot = jnp.zeros(())
        for _ in range(iters):
            tot = tot + run(dense, xf).sum()
        float(tot)
        dt = (time.perf_counter() - t0) / iters
        outn = np.asarray(out)
        lab = labels_from(outn, K, H, W)
        agree = float((lab == ref_labels).mean())
        rel = float(np.abs(outn - ref).max() / (np.abs(ref).max() + 1e-12))
        results.append((dname, k, dt, agree, rel))
        print(f"  {dname} k={k}: {dt*1e3:8.1f} ms  label_agree={agree:.6f}  max_rel={rel:.2e}",
              flush=True)

    best = min(results, key=lambda r: r[2])
    print("best:", best)


if __name__ == "__main__":
    main()
