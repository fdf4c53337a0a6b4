"""Pixel-pair path indexing + random-walk propagation (IRNet core).

Re-design of `/root/reference/IRNet/misc/indexing.py` for TPU:

- :class:`PathIndex` precomputes, on host, the flat pixel indices of every
  discrete line between pixel pairs within ``radius`` (indexing.py:6-88).
- ``edge_to_affinity``: affinity of a pair = ``1 - max(edge along path)``;
  a gather + segment max, jit-compiled (indexing.py:91-109,168-181).
- The dense affinity matrix is built with scatter (the reference goes through
  a torch *sparse tensor* then ``.to_dense()``, indexing.py:112-129).
- ``propagate_to_edge``: transition matrix ``A^beta`` column-normalized then
  squared ``exp_times`` times — 8 dense [HW, HW] matmuls that map straight
  onto the MXU (indexing.py:132-166), the reference's single heaviest op.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PathIndex:
    """Host-side precomputation of within-radius pixel-pair paths."""

    def __init__(self, radius: int, size: Tuple[int, int]):
        self.radius = radius
        self.radius_floor = int(np.ceil(radius) - 1)
        self.size = tuple(size)

        self.paths_by_length, self.search_dst = self._search_paths(radius)
        self.path_indices, self.src_indices, self.dst_indices = self._path_indices(self.size)

    @staticmethod
    def _search_paths(max_radius: int):
        """Enumerate displacement directions and the pixel chain of each
        direction's discrete line, grouped by chain length."""
        search_dirs = [(0, x) for x in range(1, max_radius)]
        for y in range(1, max_radius):
            for x in range(-max_radius + 1, max_radius):
                if x * x + y * y < max_radius ** 2:
                    search_dirs.append((y, x))

        by_length: dict = {}
        dst_list: List[List[Tuple[int, int]]] = []
        for dy, dx in search_dirs:
            length_sq = dy * dy + dx * dx
            ys = sorted((0, dy))
            xs = sorted((0, dx))
            coords = []
            for y in range(ys[0], ys[1] + 1):
                for x in range(xs[0], xs[1] + 1):
                    # squared distance of (y, x) from the line to (dy, dx)
                    if (dy * x - dx * y) ** 2 / length_sq < 1:
                        coords.append([y, x])
            coords.sort(key=lambda c: -abs(c[0]) - abs(c[1]))
            by_length.setdefault(len(coords), []).append(coords)

        paths_by_length = [np.asarray(v) for _, v in sorted(by_length.items())]
        # order must match the reference: grouped by ascending path length,
        # destination = first coordinate of each path (farthest point)
        dst = np.concatenate([p[:, 0] for p in paths_by_length], axis=0)
        return paths_by_length, dst

    def _path_indices(self, size: Tuple[int, int]):
        h, w = size
        rf = self.radius_floor
        full = np.arange(h * w, dtype=np.int64).reshape(h, w)
        ch = h - rf
        cw = w - 2 * rf
        if ch <= 0 or cw <= 0:
            raise ValueError(
                f"PathIndex size {size} too small for radius {self.radius}: "
                f"needs height > {rf} and width > {2 * rf} "
                f"(IRNet: crop_size/4 must exceed 2*(radius-1))"
            )

        path_indices = []
        for paths in self.paths_by_length:
            per_len = []
            for path in paths:
                rows = []
                for dy, dx in path:
                    window = full[dy : dy + ch, rf + dx : rf + dx + cw].reshape(-1)
                    rows.append(window)
                per_len.append(rows)
            path_indices.append(np.asarray(per_len))  # [n_paths, path_len, n_pairs]

        src = full[:ch, rf : rf + cw].reshape(-1)
        dst = np.concatenate([p[:, 0] for p in path_indices], axis=0)
        return path_indices, src, dst


def edge_to_affinity(edge_flat: jnp.ndarray, path_indices: Sequence[np.ndarray]) -> jnp.ndarray:
    """edge_flat: [B, HW] edge probabilities -> affinities [B, n_pairs_total].

    affinity(pair) = 1 - max(edge over the path connecting the pair).
    """
    affs = []
    for ind in path_indices:
        idx = jnp.asarray(ind)  # [n_paths, plen, n_pairs]
        gathered = edge_flat[:, idx]               # [B, n_paths, plen, n_pairs]
        affs.append(1.0 - gathered.max(axis=2))    # [B, n_paths, n_pairs]
    return jnp.concatenate([a.reshape(a.shape[0], -1) for a in affs], axis=1)


def path_max_affinity_slices(edge2d: jnp.ndarray, path_index: "PathIndex") -> List[jnp.ndarray]:
    """``1 - max(edge along path)`` per pair via STATIC SLICES.

    Each entry of a path's flat index array is the window
    ``full[dy:dy+ch, rf+dx:rf+dx+cw]`` (see :meth:`PathIndex._path_indices`),
    so the gather ``edge_flat[:, ind]`` is exactly a 2D slice of the edge map
    — and slices are what the TPU wants: pure copies that XLA fuses into the
    surrounding max/elementwise, with a pad-add transpose in the backward,
    instead of serial VPU gathers with a scatter-add backward (measured: the
    IRN training step's affinity term was gather-bound, docs/PERF_NOTES.md
    round 5). Identical values to :func:`edge_to_affinity` (same elements,
    same max; pinned by tests/test_pseudo.py::test_path_max_slices_exact).

    edge2d: [..., H, W] -> list (per path-length group) of
    [..., n_paths, ch*cw], concat-ready in the gather formulation's order.
    """
    H, W = edge2d.shape[-2:]
    rf = path_index.radius_floor
    ch, cw = H - rf, W - 2 * rf
    lead = edge2d.shape[:-2]
    groups = []
    for paths in path_index.paths_by_length:
        per = []
        for path in paths:  # [plen, 2] (dy, dx) offsets
            vals = jnp.stack(
                [edge2d[..., dy : dy + ch, rf + dx : rf + dx + cw]
                 for dy, dx in path], axis=0)
            per.append(vals.max(axis=0))
        group = jnp.stack(per, axis=-3)  # [..., n_paths, ch, cw]
        groups.append(1.0 - group.reshape(*lead, len(paths), ch * cw))
    return groups


def affinity_to_dense(aff: jnp.ndarray, src: np.ndarray, dst: np.ndarray, n: int) -> jnp.ndarray:
    """Symmetric dense [n, n] affinity with unit diagonal from sparse pair values.

    aff: [n_pairs_total] (single image), pairs = (src tiled per direction, dst).
    """
    n_dirs = dst.shape[0]  # dst: [n_directions, n_pairs]
    ind_from = jnp.asarray(np.tile(src, n_dirs))
    ind_to = jnp.asarray(dst.reshape(-1))
    dense = jnp.zeros((n, n), aff.dtype)
    flat = aff.reshape(-1)
    dense = dense.at[ind_from, ind_to].add(flat)
    dense = dense.at[ind_to, ind_from].add(flat)
    dense = dense.at[jnp.arange(n), jnp.arange(n)].add(1.0)
    return dense


def to_transition_matrix(dense_aff: jnp.ndarray, beta: float, times: int) -> jnp.ndarray:
    """``A^beta`` column-normalized, then squared ``times`` times (T^(2^times))."""
    scaled = jnp.power(dense_aff, beta)
    trans = scaled / scaled.sum(axis=0, keepdims=True)

    def body(t, _):
        t = t @ t
        return t, None

    trans, _ = jax.lax.scan(body, trans, None, length=times)
    return trans


def _affinity_band(aff_grids: jnp.ndarray, dirs: np.ndarray,
                   H: int, W: int, woff: int) -> Tuple[jnp.ndarray, int]:
    """Symmetric [HW, HW] affinity (unit diagonal) in BAND form, no scatter.

    ``aff_grids``: [n_dirs, ch, cw] per-direction affinities on the padded
    src-window grid (src at window (r, c') = cropped pixel (r, c' - woff));
    ``dirs``: [n_dirs, 2] int (dy, dx) with dy >= 0 and dy*W + dx > 0.

    The affinity matrix is banded: direction (dy, dx) only writes the
    constant flat-index offset ``o = dy*W + dx`` (and its mirror ``-o``).
    Each band column is assembled with static slices/pads (the valid pairs
    of a direction form a rectangle in the cropped grid) and stacked, giving
    ``band[i, o + max_off] == dense[i, i + o]`` of shape [HW, 2*max_off+1]
    (entries whose column ``i + o`` falls outside the matrix are zero by the
    rectangle pads). Returns ``(band, max_off)``; :func:`_band_to_dense`
    materializes the dense matrix from it. This replaces a 2x ~600k-element
    scatter into a padded [~18k, ~18k] buffer + crop (measured 3x the cost
    of the 8 matmul squarings) with pure copies. (A band-domain prefix that
    never materializes dense before the squarings exists as the opt-in
    ``TRIS_WALK_BANDPREFIX`` — measured slower than the dense prefix on TPU,
    see ``_walk_defaults``.)
    """
    n = H * W
    max_off = max(int(dy) * W + int(dx) for dy, dx in dirs)
    width = 2 * max_off + 1
    assert width <= n + 1, (width, n)  # caller guards (banded_ok)

    # band row (= offset + max_off) -> [HW] values; directions may SHARE a
    # flat offset on narrow grids (dy1*W+dx1 == dy2*W+dx2 whenever
    # W <= 2*(radius-1)), and an offset-0 direction shares the diagonal's
    # row — accumulate, matching the scatter path's `.add` semantics.
    pieces = {}

    def _acc(key, arr):
        pieces[key] = arr if key not in pieces else pieces[key] + arr

    for d, (dy, dx) in enumerate(dirs):
        dy, dx = int(dy), int(dx)
        off = dy * W + dx
        c0, c1 = max(0, -dx), min(W, W - dx)
        r1 = H - dy
        if c1 <= c0 or r1 <= 0:
            continue  # |dx| >= W or dy >= H: no in-crop pairs (zero contribution)
        vals = aff_grids[d, 0:r1, c0 + woff:c1 + woff]
        # dense[src, dst] at offset +off: value sits at row src = (r, c')
        _acc(off + max_off, jnp.pad(vals, ((0, H - r1), (c0, W - c1))).reshape(n))
        # dense[dst, src] at offset -off: value sits at row dst = (r+dy, c'+dx)
        _acc(-off + max_off, jnp.pad(
            vals, ((dy, 0), (c0 + dx, W - c1 - dx))).reshape(n))
    _acc(max_off, jnp.ones((n,), aff_grids.dtype))  # unit diagonal

    # band rows in offset order, zero rows in the gaps, as ONE concat
    rows, prev = [], 0
    for k in sorted(pieces):
        if k > prev:
            rows.append(jnp.zeros((k - prev, n), aff_grids.dtype))
        rows.append(pieces[k][None])
        prev = k + 1
    if prev < width:
        rows.append(jnp.zeros((width - prev, n), aff_grids.dtype))
    band = jnp.concatenate(rows, axis=0).T           # [HW, width]
    return band, max_off


def _band_to_dense(band: jnp.ndarray, max_off: int) -> jnp.ndarray:
    """[HW, 2*max_off+1] band -> dense [HW, HW] with one pad + flat slice.

    Element (i, k) of a zero-padded [HW, HW+1] band lands at flat
    ``i*(HW+1) + k``, which scans the per-row diagonals of the [HW, HW]
    matrix shifted by one per row — so a single flat slice materializes the
    dense matrix (requires width <= HW+1, the caller's ``banded_ok``).
    """
    n, width = band.shape
    flat = jnp.pad(band, ((0, 0), (0, n + 1 - width))).reshape(-1)
    return jax.lax.dynamic_slice(flat, (max_off,), (n * n,)).reshape(n, n)


def _banded_dense_affinity(aff_grids: jnp.ndarray, dirs: np.ndarray,
                           H: int, W: int, woff: int) -> jnp.ndarray:
    """Dense symmetric [HW, HW] affinity (unit diagonal) without any scatter."""
    return _band_to_dense(*_affinity_band(aff_grids, dirs, H, W, woff))


def _banded_sq_plan(n: int, max_off: int, k_total: int, bs: int = 1024) -> int:
    """How many leading squarings of the walk to run block-banded.

    The transition matrix is banded (|i - j| <= max_off ~= 4W+4 at radius 5),
    and squaring doubles the band: T^(2^s) has half-width 2^s * max_off. With
    the matrix split into [bs, bs] blocks (block band p = ceil(width/bs)),
    squaring s costs ``nb * (2p+1)^2`` block matmuls against the dense
    ``nb^3`` — skipping only exactly-zero blocks. Banded squarings run while
    (a) the band->dense flat-slice assembly stays valid after the squaring
    (2*(2p)+1 <= nb+1) and (b) the FLOP win is >= 2x. At the 128x128 bucket
    this plans 3 banded squarings: 47.7 vs 70.4 TFLOP for the whole walk.
    """
    if n % bs != 0:
        return 0
    nb = n // bs
    if nb < 8:
        return 0
    p = -(-max_off // bs)
    k = 0
    while k < k_total:
        if 2 * (2 * p) + 1 > nb + 1:  # assembly/band bound after this squaring
            break
        if nb * (2 * p + 1) ** 2 * 2 > nb ** 3:  # < 2x FLOP win: stop
            break
        k += 1
        p *= 2
    return k


def _shift_blocks(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """[nb, bs, bs] -> same shape with result[I] = x[I + d] (zeros outside)."""
    if d == 0:
        return x
    if d > 0:
        return jnp.pad(x[d:], ((0, d), (0, 0), (0, 0)))
    return jnp.pad(x[:d], ((-d, 0), (0, 0), (0, 0)))


def _block_banded_squarings(trans: jnp.ndarray, max_off: int, k: int, dtype,
                            bs: int = 1024) -> jnp.ndarray:
    """Compute ``trans^(2^k)`` using the band structure, returning dense.

    Only blocks that are identically zero by the band structure are skipped
    (x + 0 == x in fp); the nonzero contributions accumulate per output block
    in ascending-k order in f32, which reassociates the MXU's internal
    accumulation granularity — measured max_rel 1.6e-4 vs the dense chain on
    TPU with IDENTICAL final ins_seg labels (tools/walk_experiments.py).
    The per-diagonal representation ``diags[e][I] = block (I, I+e)`` is
    extracted with strided slices, squared with batched einsums, and
    re-assembled densely with the same flat-slice trick as
    :func:`_banded_dense_affinity` lifted to block granularity.
    """
    n = trans.shape[0]
    nb = n // bs
    p = -(-max_off // bs)
    cdtype = jnp.dtype(dtype)

    flat = trans.reshape(nb, bs, nb, bs).transpose(0, 2, 1, 3).reshape(nb * nb, bs, bs)

    def diag(e: int) -> jnp.ndarray:
        if e >= 0:
            d = flat[e :: nb + 1][: nb - e]
            return jnp.pad(d, ((0, e), (0, 0), (0, 0)))
        d = flat[-e * nb :: nb + 1][: nb + e]
        return jnp.pad(d, ((-e, 0), (0, 0), (0, 0)))

    diags = {e: diag(e) for e in range(-p, p + 1)}
    diags, p = _blockdiags_square(diags, p, k, cdtype)
    return _blockdiags_to_dense(diags, p, nb, bs)


def _blockdiags_square(diags: dict, p: int, k: int, cdtype) -> Tuple[dict, int]:
    """Square the block-band ``diags[e][I] = block (I, I+e)`` ``k`` times."""
    for _ in range(k):
        newp = 2 * p
        nd = {}
        for e in range(-newp, newp + 1):
            acc = None
            for d in range(max(-p, e - p), min(p, e + p) + 1):
                # C[I, I+e] += A[I, I+d] @ A[I+d, (I+d)+(e-d)]; the cross-term
                # sum stays f32 like a dense matmul's internal accumulator —
                # rounding each block product to bf16 first costs 2e-2 rel
                term = jnp.einsum(
                    "nij,njk->nik", diags[d], _shift_blocks(diags[e - d], d),
                    preferred_element_type=jnp.float32,
                )
                acc = term if acc is None else acc + term
            nd[e] = acc.astype(cdtype)
        diags, p = nd, newp
    return diags, p


def _blockdiags_to_dense(diags: dict, p: int, nb: int, bs: int) -> jnp.ndarray:
    """Block-diagonal stacks -> dense [nb*bs, nb*bs] via the flat-slice trick
    of :func:`_band_to_dense` lifted to block granularity."""
    band = jnp.stack([diags[e] for e in range(-p, p + 1)], axis=1)
    band = jnp.pad(band, ((0, 0), (0, nb + 1 - (2 * p + 1)), (0, 0), (0, 0)))
    dense_blocks = band.reshape(nb * (nb + 1), bs, bs)[p : p + nb * nb]
    n = nb * bs
    return dense_blocks.reshape(nb, nb, bs, bs).transpose(0, 2, 1, 3).reshape(n, n)


def _band_to_blockdiags(band: jnp.ndarray, max_off: int, p: int,
                        bs: int) -> dict:
    """Extract ``diags[e][I] = block (I, I+e)`` straight from the band.

    Block (I, I+e) element (r, c) is ``dense[I*bs+r, (I+e)*bs+c] =
    band[I*bs+r, e*bs + c - r + max_off]`` — a gather along the band's
    offset axis with an index map that is the SAME for every block row I, so
    each diagonal is one [nb, bs, bs] gather. Entries whose offset falls
    outside the band (or whose column falls outside the matrix — zero in the
    band by construction) are masked to 0. This avoids ever materializing
    the dense [HW, HW] matrix before the banded squarings.
    """
    n, width = band.shape
    nb = n // bs
    bandr = band.reshape(nb, bs, width)
    r = jnp.arange(bs)[:, None]
    c = jnp.arange(bs)[None, :]
    diags = {}
    for e in range(-p, p + 1):
        idx = e * bs + c - r + max_off                 # [bs, bs], iota-built
        valid = (idx >= 0) & (idx < width)
        g = jnp.take_along_axis(
            bandr, jnp.clip(idx, 0, width - 1)[None], axis=2)  # [nb, bs, bs]
        diags[e] = g * valid.astype(band.dtype)
    return diags


def _walk_defaults(k_sq, dtype, exp_times):
    """Resolve the walk's performance knobs.

    ``k_sq``: number of matrix squarings; the remaining ``2^(exp_times-k_sq)``
    factors of T are applied as thin ``[K, HW] @ [HW, HW]`` steps. Algebraic
    identity: ``x @ T^(2^e) == (((x @ S) @ S)...) with S = T^(2^k)`` applied
    ``2^(e-k)`` times — squarings are FLOP-bound (2n^3 each), thin steps are
    HBM-bound (one T read each). On v5e, ``k_sq=2`` is ~1.9x faster than the
    all-squarings formulation even after the bf16 win below
    (tools/walk_experiments.py: 397.7 -> 204.5 ms at the 128x128 bucket) —
    but the reassociation moves final ins_seg labels on ~1-9% of fixture
    pixels (in TRUE f32 it is benign — max_rel 2e-5, 100% label agreement —
    the wobble comes from its interplay with bf16 operand rounding), so the
    DEFAULT stays ``k_sq=exp_times`` (the reference formulation) and the
    restructure is an explicit opt-in: env ``TRIS_WALK_KSQ``.

    ``dtype``: storage dtype of T between matmuls. On TPU the default is
    **bfloat16**, which is BIT-IDENTICAL to the f32 path there (XLA's default
    matmul precision already feeds the MXU bf16 operands; measured max |d| =
    0 over the full 128x128 bucket, tools/walk_experiments.py) while reading
    half the HBM bytes: 729.7 -> 397.7 ms, 1.83x. On CPU (and any backend
    whose f32 matmul is true f32 — the test mesh, parity runs) the default
    stays float32: there bf16 storage is a REAL numerics change (91% label
    agreement on the fixture). Env ``TRIS_WALK_DTYPE`` overrides either way.
    """
    import os

    if k_sq is None:
        k_sq = int(os.environ.get("TRIS_WALK_KSQ", str(exp_times)))
    if dtype is None:
        dtype = os.environ.get("TRIS_WALK_DTYPE")
        if dtype is None:
            dtype = "bfloat16" if jax.default_backend() in ("tpu", "axon") else "float32"
    # block-banded leading squarings: skips only exactly-zero blocks, exact
    # in real arithmetic; in fp the block-level partial sums reassociate the
    # MXU's accumulation (measured max_rel 1.6e-4, final ins_seg labels
    # IDENTICAL at the 128x128 bucket, tools/walk_experiments.py). Default on
    # for TPU (396.6 -> 301.1 ms/walk), off elsewhere (no need on the f32
    # test/parity mesh, where exactness bars are tighter).
    bandsq_env = os.environ.get("TRIS_WALK_BANDSQ")
    if bandsq_env is None:
        bandsq = jax.default_backend() in ("tpu", "axon")
    else:
        bandsq = bandsq_env == "1"
    # band-domain PREFIX (pow + column-normalize on the [HW, 2*max_off+1]
    # band, never materializing dense before the squarings): measured a
    # REGRESSION on the real chip at the production 128x128 bucket
    # (tools/walk_prefix_ab.py round 5: dense+bandsq 342 ms vs band+bandsq
    # 481 ms — the band's gather-assembled normalize + blockdiag extraction
    # costs more than the dense build it avoids), so the default is the
    # dense prefix everywhere; opt-in via TRIS_WALK_BANDPREFIX=1 (exactness
    # pinned by tests/test_pseudo.py::test_band_prefix_walk_matches_dense_prefix).
    band_prefix = os.environ.get("TRIS_WALK_BANDPREFIX", "0") == "1"
    return int(k_sq), str(dtype), bandsq, band_prefix


@functools.lru_cache(maxsize=16)
def _walk_program(radius: int, H: int, W: int, beta: float, exp_times: int,
                  k_sq: int, dtype: str, bandsq: bool = False,
                  band_prefix: bool = False):
    """One jitted program for the whole walk at a given bucket shape: edge ->
    path-max affinities -> banded dense build -> A^beta column-normalized ->
    min(k_sq, exp_times) squarings -> 2^(exp_times-k_sq) thin [K, HW] @ trans
    steps. ``k_sq >= exp_times`` with dtype float32 is the reference
    formulation (all squarings, one final matmul). Cached per config; jit
    itself specializes over K."""
    hor, ver = W + 2 * radius, H + radius
    pi = _padded_path_index(radius, (ver, hor))
    ch = ver - pi.radius_floor
    cw = hor - 2 * pi.radius_floor
    woff = radius - pi.radius_floor
    dirs = np.asarray(pi.search_dst, np.int64)
    banded_ok = 2 * max(int(dy) * W + int(dx) for dy, dx in dirs) + 1 <= H * W + 1

    @jax.jit
    def run(x, edge):
        K = x.shape[0]
        cdtype = jnp.dtype(dtype)
        k = min(k_sq, exp_times)
        max_off = max(int(dy) * W + int(dx) for dy, dx in dirs)
        kb = _banded_sq_plan(H * W, max_off, k) if (bandsq and banded_ok) else 0
        edge_padded = jnp.pad(edge, ((0, radius), (radius, radius)),
                              constant_values=1.0)
        if banded_ok:
            # static-slice path max (identical values to the flat-gather
            # formulation — see path_max_affinity_slices)
            groups = path_max_affinity_slices(edge_padded, pi)
            aff_grids = jnp.concatenate(groups, axis=0).reshape(-1, ch, cw)
            if band_prefix:
                # Band-domain prefix (opt-in, TRIS_WALK_BANDPREFIX — measured
                # SLOWER than the dense prefix on TPU, see _walk_defaults):
                # run pow + the column normalization on the
                # [HW, 2*max_off+1] band (~3% of dense at the 128x128
                # bucket) instead of materializing the f32 dense matrix
                # first. The pre-normalization matrix is SYMMETRIC (each
                # pair written both ways + unit diagonal) and pow is
                # elementwise, so the dense COLUMN sums equal the band's
                # ROW sums; band entry (i, o) then divides by
                # colsum[i + o - max_off]. Elementwise identical to the
                # dense prefix up to the column-sum reduction order (same
                # multiset of nonzero terms — zeros add exactly — ordered by
                # the compiler in both formulations).
                band, _ = _affinity_band(aff_grids, dirs, H, W, woff)
                n = H * W
                band_pow = jnp.power(band, beta)
                colsum = band_pow.sum(axis=1)   # >= 1 (unit diagonal)
                col = jnp.clip(jnp.arange(n)[:, None]
                               + jnp.arange(2 * max_off + 1)[None, :] - max_off,
                               0, n - 1)        # clipped entries: numerator 0
                tband = (band_pow / colsum[col]).astype(cdtype)
                if kb:
                    bs = 1024
                    diags = _band_to_blockdiags(tband, max_off,
                                                -(-max_off // bs), bs)
                    diags, p = _blockdiags_square(diags, -(-max_off // bs),
                                                  kb, cdtype)
                    trans = _blockdiags_to_dense(diags, p, n // bs, bs)
                else:
                    trans = _band_to_dense(tband, max_off)
            else:
                dense = _banded_dense_affinity(aff_grids, dirs, H, W, woff)
        else:
            # tiny/degenerate grids where an offset spans multiple rows:
            # scatter build at padded size + crop (the original formulation)
            aff = edge_to_affinity(edge_padded.reshape(1, -1), pi.path_indices)[0]
            dense = affinity_to_dense(aff, pi.src_indices, pi.dst_indices, ver * hor)
            dense = dense.reshape(ver, hor, ver, hor)
            dense = dense[:-radius, radius:-radius, :-radius, radius:-radius]
            dense = dense.reshape(H * W, H * W)

        if not (banded_ok and band_prefix):
            # dense prefix (default): pow + column-normalize the dense
            # matrix, then run the leading kb squarings block-banded
            # (dense+bandsq — the fastest measured formulation,
            # tools/walk_prefix_ab.py: 342 ms vs 438 dense-sq / 481 band)
            scaled = jnp.power(dense, beta)
            trans = (scaled / scaled.sum(axis=0, keepdims=True)).astype(cdtype)
            if kb:
                trans = _block_banded_squarings(trans, max_off, kb, cdtype)

        def sq(t, _):
            return (t @ t).astype(cdtype), None

        trans, _ = jax.lax.scan(sq, trans, None, length=k - kb)

        x_masked = (x * (1.0 - edge)[None]).reshape(K, H * W).astype(cdtype)

        def thin(v, _):
            return (v @ trans).astype(cdtype), None

        rw, _ = jax.lax.scan(thin, x_masked, None, length=2 ** (exp_times - k))
        return rw.astype(jnp.float32).reshape(K, H, W)

    return run


def propagate_to_edge(
    x: jnp.ndarray,
    edge: jnp.ndarray,
    radius: int = 5,
    beta: float = 10.0,
    exp_times: int = 8,
    k_sq: int | None = None,
    dtype: str | None = None,
) -> jnp.ndarray:
    """Random-walk propagation of score maps along low-edge paths.

    x: [K, H, W] per-instance score maps; edge: [H, W] boundary probability.
    Returns [K, H, W]. Matches indexing.py:141-166: the edge map is padded
    with 1.0 (right/left by radius, bottom by radius), the affinity is built
    at the padded size, then cropped back before the matmul chain. The whole
    walk runs as ONE jitted program per (radius, shape), with the dense
    affinity assembled band-wise instead of by scatter
    (see _banded_dense_affinity). ``k_sq``/``dtype`` trade squarings for thin
    HBM-bound steps and T's storage precision (see :func:`_walk_defaults`);
    pass ``k_sq=exp_times, dtype='float32'`` for the reference formulation.
    """
    K, H, W = x.shape
    k_sq, dtype, bandsq, band_prefix = _walk_defaults(k_sq, dtype, int(exp_times))
    return _walk_program(
        int(radius), H, W, float(beta), int(exp_times), k_sq, dtype, bandsq,
        band_prefix,
    )(x, edge)


@functools.lru_cache(maxsize=8)
def _padded_path_index(radius: int, size: Tuple[int, int]) -> PathIndex:
    return PathIndex(radius, size)


def propagate_to_edge_bucketed(
    x: np.ndarray,
    edge: np.ndarray,
    radius: int = 5,
    beta: float = 10.0,
    exp_times: int = 8,
    bucket: int = 32,
    max_instances: int = 16,
    device=None,
) -> jnp.ndarray:
    """Shape-bucketed random walk: pads (H, W) up to multiples of ``bucket``
    and K up to ``max_instances`` so jit compiles once per bucket instead of
    once per image size.

    The padding is EXACT, not approximate: padded pixels get edge = 1, so
    every path crossing them has affinity 1 - max(edge) = 0, the transition
    matrix gives them only a self-loop, and the source maps are zero there —
    the walk cannot enter or leave the pad region.

    Returns the cropped [K, H, W] walk as a DEVICE array (dispatch is async;
    ``np.asarray`` the result to synchronize). ``device`` pins the program to
    one chip so a sharded ins_seg pass can drive every local device from
    threads (make_ins_seg_labels.py:175-184 fans out the same way with one
    process per GPU).
    """
    K, H, W = x.shape
    Hp = -(-H // bucket) * bucket
    Wp = -(-W // bucket) * bucket
    Kp = min(-(-K // max_instances) * max_instances, max(K, max_instances))
    if isinstance(x, np.ndarray):
        x_p = np.zeros((Kp, Hp, Wp), np.float32)
        x_p[:K, :H, :W] = x
        x_p = jax.device_put(x_p, device)
    else:  # already on device: pad there
        x_p = jnp.pad(x.astype(jnp.float32), ((0, Kp - K), (0, Hp - H), (0, Wp - W)))
    if isinstance(edge, np.ndarray):
        edge_p = np.ones((Hp, Wp), np.float32)
        edge_p[:H, :W] = edge
        edge_p = jax.device_put(edge_p, device)
    else:  # already on device: pad there (avoids a host round-trip)
        edge_p = jnp.pad(edge, ((0, Hp - H), (0, Wp - W)), constant_values=1.0)
    rw = propagate_to_edge(x_p, edge_p, radius=radius, beta=beta, exp_times=exp_times)
    return rw[:K, :H, :W]
