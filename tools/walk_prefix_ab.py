"""A/B the walk program's PREFIX formulations on the real chip.

Variants (all end in the same thin-step tail):
  dense+densesq : dense build -> dense pow/norm -> k dense squarings
  dense+bandsq  : dense build -> dense pow/norm -> blockdiag extract from
                  dense -> kb banded squarings -> remaining dense (round-4
                  recorded path, commit 1c04c8c)
  band+bandsq   : band build -> band pow/norm -> blockdiag extract from
                  band -> kb banded squarings (snapshot path, never
                  materializes dense before the squarings)
  band+densesq  : band build -> band pow/norm -> band_to_dense -> k dense
                  squarings (isolates the band prefix from the banded sq)

Unlike tools/walk_experiments.py (starts from a prebuilt dense matrix),
this times WHOLE jitted programs edge->rw including the affinity build.

Run: python tools/walk_prefix_ab.py [grid_h grid_w]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def make_inputs(H, W, K=16, seed=0):
    rng = np.random.default_rng(seed)
    from scipy import ndimage

    edge = rng.random((H, W)).astype(np.float32)
    edge = ndimage.gaussian_filter(edge, 5)
    edge = (edge - edge.min()) / (edge.max() - edge.min())
    x = (rng.random((K, H, W)) * (rng.random((K, 1, 1)) > 0.3)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(edge)


def program(H, W, prefix, sq, radius=5, beta=10.0, e=8, dtype="bfloat16"):
    from tris_tpu.pseudo import indexing as I

    hor, ver = W + 2 * radius, H + radius
    pi = I._padded_path_index(radius, (ver, hor))
    ch = ver - pi.radius_floor
    cw = hor - 2 * pi.radius_floor
    woff = radius - pi.radius_floor
    dirs = np.asarray(pi.search_dst, np.int64)
    n = H * W
    max_off = max(int(dy) * W + int(dx) for dy, dx in dirs)
    kb = I._banded_sq_plan(n, max_off, e) if sq == "bandsq" else 0
    bs = 1024
    p = -(-max_off // bs)
    cdtype = jnp.dtype(dtype)

    @jax.jit
    def run(x, edge):
        K = x.shape[0]
        ep = jnp.pad(edge, ((0, radius), (radius, radius)), constant_values=1.0)
        grids = []
        for ind in pi.path_indices:
            g = ep.reshape(-1)[jnp.asarray(ind)]
            grids.append(1.0 - g.max(axis=1))
        aff_grids = jnp.concatenate(grids, axis=0).reshape(-1, ch, cw)

        if prefix == "band":
            band, _ = I._affinity_band(aff_grids, dirs, H, W, woff)
            band_pow = jnp.power(band, beta)
            colsum = band_pow.sum(axis=1)
            col = jnp.clip(jnp.arange(n)[:, None]
                           + jnp.arange(2 * max_off + 1)[None, :] - max_off,
                           0, n - 1)
            tband = (band_pow / colsum[col]).astype(cdtype)
            if kb:
                diags = I._band_to_blockdiags(tband, max_off, p, bs)
                diags, pp = I._blockdiags_square(diags, p, kb, cdtype)
                trans = I._blockdiags_to_dense(diags, pp, n // bs, bs)
            else:
                trans = I._band_to_dense(tband, max_off)
        else:
            dense = I._banded_dense_affinity(aff_grids, dirs, H, W, woff)
            scaled = jnp.power(dense, beta)
            trans = (scaled / scaled.sum(axis=0, keepdims=True)).astype(cdtype)
            if kb:
                trans = I._block_banded_squarings(trans, max_off, kb, cdtype)

        def sqf(t, _):
            return (t @ t).astype(cdtype), None

        trans, _ = jax.lax.scan(sqf, trans, None, length=e - kb)
        xm = (x * (1.0 - edge)[None]).reshape(K, n).astype(cdtype)
        return (xm @ trans).astype(jnp.float32)

    return run


def time_program(run, x, edge, iters=8):
    acc = run(x, edge).sum()
    float(acc)  # compile + warm (relay: sync via value fetch)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = jnp.zeros(())
        for _ in range(iters):
            acc = acc + run(x, edge).sum()
        assert np.isfinite(float(acc))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    # argv: [variants] [H W]; variants = comma list of prefix:sq
    variants = [("dense", "bandsq"), ("band", "bandsq")]
    args = sys.argv[1:]
    if args and ":" in args[0]:
        variants = [tuple(v.split(":")) for v in args[0].split(",")]
        args = args[1:]
    H, W = (int(args[0]), int(args[1])) if len(args) > 1 else (128, 128)
    x, edge = make_inputs(H, W)
    jax.block_until_ready((x, edge))
    dtype = "bfloat16" if jax.default_backend() in ("tpu", "axon") else "float32"
    print(f"grid {H}x{W}, K={x.shape[0]}, dtype={dtype}", flush=True)

    # NOTE e=8 here runs e squarings + ONE thin matmul (k_sq=e formulation);
    # production default also uses k_sq=e.
    outs = {}
    for prefix, sq in variants:
        run = program(H, W, prefix, sq, dtype=dtype)
        dt = time_program(run, x, edge)
        outs[(prefix, sq)] = np.asarray(run(x, edge))
        print(f"{prefix:>5}+{sq:<7}: {dt * 1e3:8.1f} ms/walk", flush=True)
    ref = next(iter(outs.values()))
    for k, v in outs.items():
        d = np.abs(v - ref).max()
        print(f"{k}: max_abs {d:.3e} rel {d / (np.abs(ref).max() + 1e-12):.3e}")


if __name__ == "__main__":
    main()
