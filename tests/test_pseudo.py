"""IRNet pseudo-labeling subsystem tests, including direct parity checks
against the reference implementation (imported read-only, patched to CPU)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tris_tpu.pseudo import indexing as our_idx
from tris_tpu.pseudo.aug import affinity_labels_from_indices, pil_rescale
from tris_tpu.pseudo.crf import crf_inference_label, unary_from_labels
from tris_tpu.pseudo.irnet import IRNet, affinity_displacement_losses, edge_displacement_infer
from tris_tpu.pseudo.labels import (
    cluster_centroids,
    detect_instance,
    find_centroids_with_refinement,
)


@pytest.fixture(scope="module")
def ref_indexing():
    sys.path.insert(0, "/root/reference/IRNet")
    try:
        import torch

        orig_cuda = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self, *a, **k: self
        from misc import indexing as ref_idx

        yield ref_idx
        torch.Tensor.cuda = orig_cuda
    finally:
        sys.path.remove("/root/reference/IRNet")


def test_path_index_parity(ref_indexing):
    ref = ref_indexing.PathIndex(radius=5, default_size=(20, 24))
    ours = our_idx.PathIndex(5, (20, 24))
    assert len(ref.path_indices) == len(ours.path_indices)
    for a, b in zip(ref.path_indices, ours.path_indices):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(ref.src_indices, ours.src_indices)
    np.testing.assert_array_equal(ref.dst_indices, ours.dst_indices)
    np.testing.assert_array_equal(ref.search_dst, ours.search_dst)


def test_propagate_to_edge_parity(ref_indexing, rng):
    import torch

    H, W, K = 12, 14, 3
    x = rng.random((K, H, W)).astype(np.float32)
    edge = (rng.random((H, W)) * 0.9).astype(np.float32)
    ref_rw = ref_indexing.propagate_to_edge(
        torch.tensor(x), torch.tensor(edge), radius=5, beta=10, exp_times=4
    ).numpy().reshape(K, H, W)
    # k_sq=exp_times + f32 is exactly the reference formulation (all
    # squarings, one final matmul); default resolution and the opt-in
    # restructure are covered by the test_walk_* tests below.
    our_rw = np.asarray(our_idx.propagate_to_edge(
        x, edge, radius=5, beta=10.0, exp_times=4, k_sq=4, dtype="float32"))
    np.testing.assert_allclose(our_rw, ref_rw, atol=2e-5, rtol=1e-4)


def _walk_fixture(rng, H=48, W=40, K=5):
    """Smooth edge map with real structure (random blobs), instance-masked cams."""
    from scipy import ndimage

    edge = ndimage.gaussian_filter(rng.random((H, W)).astype(np.float32), 4)
    edge = (edge - edge.min()) / (edge.max() - edge.min() + 1e-9)
    x = (rng.random((K, H, W)) * (rng.random((K, 1, 1)) > 0.3)).astype(np.float32)
    return x, edge


def _walk_labels(rw, thres=0.25):
    """The only thing downstream consumes: max-normalize + bg-threshold argmax
    (labels.make_instance_masks)."""
    m = rw / max(rw.max(), 1e-12)
    padded = np.concatenate([np.full((1,) + rw.shape[1:], thres, np.float32), m], 0)
    return np.argmax(padded, 0)


def test_walk_defaults_match_reference_formulation(rng):
    """On this (CPU) backend the walk's resolved defaults must BE the reference
    formulation — k_sq=exp_times, float32 — because true-f32 matmuls make any
    reduced config a real numerics change (measured: bf16 T storage lands at
    only ~91% label agreement on this fixture; indexing._walk_defaults). On
    TPU the default flips to bf16 storage, which is bit-identical THERE (XLA's
    default matmul precision already feeds the MXU bf16 operands; measured
    max|d| = 0 at the 128x128 bucket through this exact code path, see
    _walk_defaults' docstring and docs/PERF_NOTES.md round 4)."""
    import jax

    if jax.default_backend() != "cpu":
        import pytest

        pytest.skip("default-resolution contract below is the CPU one")
    x, edge = _walk_fixture(rng)
    ref = np.asarray(our_idx.propagate_to_edge(
        x, edge, radius=5, beta=10.0, exp_times=8, k_sq=8, dtype="float32"))
    got = np.asarray(our_idx.propagate_to_edge(
        x, edge, radius=5, beta=10.0, exp_times=8))  # resolved defaults
    np.testing.assert_array_equal(got, ref)


def test_walk_thin_step_restructure_exact_in_f32(rng):
    """The k_sq<exp_times opt-in (TRIS_WALK_KSQ) is an algebraic identity —
    x @ T^256 as 2 squarings + 64 thin steps — so in TRUE f32 it must agree
    with the all-squarings form to float-reassociation rounding and produce
    identical ins_seg labels (measured max_rel 2e-5 on this fixture; the
    label wobble the knob's docs warn about comes from its interplay with
    TPU bf16 operand rounding, not from the restructure itself)."""
    x, edge = _walk_fixture(rng)
    ref = np.asarray(our_idx.propagate_to_edge(
        x, edge, radius=5, beta=10.0, exp_times=8, k_sq=8, dtype="float32"))
    fast = np.asarray(our_idx.propagate_to_edge(
        x, edge, radius=5, beta=10.0, exp_times=8, k_sq=2, dtype="float32"))
    rel = np.abs(fast - ref).max() / (np.abs(ref).max() + 1e-12)
    assert rel < 1e-3, rel
    assert (_walk_labels(fast) == _walk_labels(ref)).mean() >= 0.999


def test_block_banded_squarings_match_dense(rng):
    """The block-banded leading squarings (TPU default, TRIS_WALK_BANDSQ)
    skip only exactly-zero blocks of the banded transition matrix, so they
    must reproduce dense ``T^(2^k)`` to reassociation rounding (measured on
    TPU at the production bucket: max_rel 1.6e-4, final labels identical —
    tools/walk_experiments.py)."""
    n, bs, max_off, k = 512, 32, 40, 2
    t = rng.random((n, n)).astype(np.float32)
    i = np.arange(n)
    t[np.abs(i[:, None] - i[None, :]) > max_off] = 0.0  # band structure
    t /= t.sum(0, keepdims=True)

    dense = jnp.asarray(t)
    for _ in range(k):
        dense = dense @ dense
    banded = our_idx._block_banded_squarings(
        jnp.asarray(t), max_off, k, jnp.float32, bs=bs)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                               rtol=1e-5, atol=1e-7)


def test_band_prefix_walk_matches_dense_prefix(rng):
    """The TRIS_WALK_BANDPREFIX opt-in runs pow + column normalization in
    BAND domain ([HW, 2*max_off+1]) instead of materializing the dense
    matrix first (see _walk_program; measured slower on TPU round 5, kept as
    an exactness-pinned opt-in). The band's row sums equal the dense column
    sums (symmetry), so the two prefixes are elementwise identical up to
    the column-sum reduction order — the full walk must agree to
    reassociation rounding."""
    for (H, W) in [(32, 32), (64, 64)]:
        K = 4
        x = jnp.asarray(rng.random((K, H, W)).astype(np.float32))
        edge = jnp.asarray(rng.random((H, W)).astype(np.float32))
        f = our_idx._walk_program(5, H, W, 10.0, 4, 4, "float32", False, False)
        g = our_idx._walk_program(5, H, W, 10.0, 4, 4, "float32", False, True)
        a, b = np.asarray(f(x, edge)), np.asarray(g(x, edge))
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
        assert rel < 1e-4, (H, W, rel)


def test_band_to_blockdiags_roundtrip_and_squarings(rng):
    """`_band_to_blockdiags` extracts block diagonals straight from the
    band (TPU bandsq+kb path — the dense matrix is never built before the
    squarings). The extraction must be EXACT (pure gather of the same
    entries) and the planned squarings must match the dense chain."""
    H, W, radius = 32, 32, 5
    n = H * W
    pi = our_idx._padded_path_index(radius, (H + radius, W + 2 * radius))
    ch = H + radius - pi.radius_floor
    cw = W + 2 * radius - 2 * pi.radius_floor
    woff = radius - pi.radius_floor
    dirs = np.asarray(pi.search_dst, np.int64)
    edge = jnp.asarray(rng.random((H, W)).astype(np.float32))
    ep = jnp.pad(edge, ((0, radius), (radius, radius)), constant_values=1.0)
    grids = []
    for ind in pi.path_indices:
        g = ep.reshape(-1)[jnp.asarray(ind)]
        grids.append(1.0 - g.max(axis=1))
    aff_grids = jnp.concatenate(grids, axis=0).reshape(-1, ch, cw)
    band, max_off = our_idx._affinity_band(aff_grids, dirs, H, W, woff)
    dense = our_idx._band_to_dense(band, max_off)

    for bs in (64, 128):
        plan = our_idx._banded_sq_plan(n, max_off, 8, bs)
        assert plan >= 1  # the squaring path is actually exercised
        p = -(-max_off // bs)
        nb = n // bs
        d = our_idx._band_to_blockdiags(band, max_off, p, bs)
        back = our_idx._blockdiags_to_dense(d, p, nb, bs)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(dense))
        d2, p2 = our_idx._blockdiags_square(d, p, plan, jnp.float32)
        got = our_idx._blockdiags_to_dense(d2, p2, nb, bs)
        ref = dense
        for _ in range(plan):
            ref = ref @ ref
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_banded_sq_plan_bounds():
    """Plan must stop before the doubled band violates the flat-slice
    assembly bound and must refuse non-divisible / small grids."""
    # 128x128 bucket at radius 5: max_off = 4*128 + 4
    assert our_idx._banded_sq_plan(128 * 128, 4 * 128 + 4, 8) == 3
    assert our_idx._banded_sq_plan(1000, 100, 8) == 0      # n % bs != 0
    assert our_idx._banded_sq_plan(4096, 100, 8) == 0      # nb < 8
    # plan k respects the assembly bound for the final band width
    n, max_off = 128 * 128, 4 * 128 + 4
    kb = our_idx._banded_sq_plan(n, max_off, 8)
    p = -(-max_off // 1024) * 2 ** kb
    assert 2 * p + 1 <= (n // 1024) + 1


@pytest.mark.parametrize("W", [8, 4])
def test_propagate_to_edge_parity_narrow_grid(ref_indexing, rng, W):
    """Narrow grids where distinct directions share a flat band offset
    (W <= 2*(radius-1); e.g. (0,4) and (1,-4) at W=8, and (1,-4) collides
    with the unit diagonal at W=4) — the banded build must ACCUMULATE those
    rows like the scatter build does, not overwrite them."""
    import torch

    H, K = 12, 2
    x = rng.random((K, H, W)).astype(np.float32)
    edge = (rng.random((H, W)) * 0.9).astype(np.float32)
    ref_rw = ref_indexing.propagate_to_edge(
        torch.tensor(x), torch.tensor(edge), radius=5, beta=10, exp_times=4
    ).numpy().reshape(K, H, W)
    our_rw = np.asarray(our_idx.propagate_to_edge(x, edge, radius=5, beta=10.0, exp_times=4))
    np.testing.assert_allclose(our_rw, ref_rw, atol=2e-5, rtol=1e-4)


def test_unary_from_labels():
    labels = np.array([[0, 1], [1, 0]])
    u = unary_from_labels(labels, 2, gt_prob=0.7)
    assert u.shape == (2, 4)
    np.testing.assert_allclose(u[0, 0], -np.log(0.7), rtol=1e-6)
    np.testing.assert_allclose(u[1, 0], -np.log(0.3), rtol=1e-6)


def test_crf_denoises_labels(rng):
    """CRF with a label seed matching a strong color region should clean up
    isolated label noise while keeping the region boundary."""
    h, w = 96, 96
    img = np.full((h, w, 3), 30, np.uint8)
    img[24:72, 24:72] = 200
    img = (img + rng.integers(0, 8, img.shape)).astype(np.uint8)
    labels = np.zeros((h, w), np.int32)
    labels[24:72, 24:72] = 1
    # inject label noise: a few wrong pixels on both sides
    labels[40, 40] = 0
    labels[50, 51] = 0
    labels[5, 5] = 1
    out = crf_inference_label(img, labels, t=5, n_labels=2)
    assert out.shape == (h, w)
    assert out[40, 40] == 1 and out[50, 51] == 1  # interior noise healed
    assert out[5, 5] == 0                          # bg noise healed
    assert out[10, 10] == 0 and out[48, 48] == 1


def test_centroid_refinement_converges():
    """Displacement pointing at a sink => all centroids end at the sink."""
    h, w = 17, 19
    cy, cx = 8.0, 9.0
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    disp = np.stack([np.clip(cy - yy, -1, 1), np.clip(cx - xx, -1, 1)])
    cents = find_centroids_with_refinement(disp, iterations=60)
    assert (cents[0] == 8).all() and (cents[1] == 9).all()
    inst = cluster_centroids(cents, disp)
    # one background-ish cluster + the sink cluster at most
    assert inst.shape[1:] == (h, w)
    assert inst.shape[0] <= 3


def test_detect_instance_fragments():
    score = np.zeros((1, 10, 10), np.float32)
    mask = np.zeros((1, 10, 10), bool)
    mask[0, :3, :3] = True
    mask[0, 7:, 7:] = True
    score[0] = 0.5
    det = detect_instance(score, mask, np.array([0]), max_fragment_size=0)
    assert det["mask"].shape[0] == 2  # two connected fragments
    assert (det["score"] == 0.5).all()


def test_affinity_labels():
    pi = our_idx.PathIndex(3, (8, 8))
    label = np.zeros((8, 8), np.uint8)
    label[:, 4:] = 1
    label[0, :] = 255
    bg, fg, neg = affinity_labels_from_indices(label, pi.src_indices, pi.dst_indices)
    assert bg.shape == fg.shape == neg.shape == (pi.dst_indices.shape[0], pi.src_indices.shape[0])
    assert bg.sum() > 0 and fg.sum() > 0 and neg.sum() > 0
    # no pair marked in two categories
    assert ((bg + fg + neg) <= 1).all()


@pytest.fixture(scope="module")
def irnet_setup():
    model = IRNet()
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_irnet_shapes(irnet_setup):
    model, variables = irnet_setup
    edge, dp = model.apply(variables, jnp.zeros((2, 64, 64, 3)))
    assert edge.shape == (2, 16, 16, 1)
    assert dp.shape == (2, 16, 16, 2)


def test_edge_displacement_infer(irnet_setup):
    model, variables = irnet_setup
    img = jnp.asarray(np.random.default_rng(0).standard_normal((62, 66, 3)), jnp.float32)
    edge, disp = edge_displacement_infer(model, variables, img)
    assert edge.shape == (16, 17)  # ceil(62/4), ceil(66/4)
    assert disp.shape == (2, 16, 17)
    assert float(edge.min()) >= 0.0 and float(edge.max()) <= 1.0


def test_affinity_displacement_losses_shapes(irnet_setup):
    model, variables = irnet_setup
    pi = our_idx.PathIndex(5, (16, 16))
    edge, dp = model.apply(variables, jnp.zeros((2, 64, 64, 3)))
    pos, neg, dp_fg, dp_bg = affinity_displacement_losses(edge, dp, pi)
    n_dirs = pi.dst_indices.shape[0]
    n_pairs = pi.src_indices.shape[0]
    assert pos.shape == (2, n_dirs * n_pairs)
    assert neg.shape == pos.shape
    assert dp_fg.shape == (2, 2, n_dirs, n_pairs)
    # constant dp field -> pair displacement 0 -> dp_fg = |search_dst|
    target = np.abs(pi.search_dst.T)[None, :, :, None]
    np.testing.assert_allclose(np.asarray(dp_bg), 0.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dp_fg), np.broadcast_to(target, dp_fg.shape), atol=1e-4
    )


def test_irn_train_step(irnet_setup):
    from tris_tpu.pseudo.train_irn import IRNTrainConfig, create_irn_state, make_irn_train_step

    model, variables = irnet_setup
    pi = our_idx.PathIndex(5, (16, 16))
    cfg = IRNTrainConfig(crop_size=64, radius=5)
    state = create_irn_state(model, variables, cfg, max_step=10)
    step_fn = make_irn_train_step(model, pi, donate=False)
    n_dirs, n_pairs = pi.dst_indices.shape[0], pi.src_indices.shape[0]
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.standard_normal((2, 64, 64, 3)).astype(np.float32),
        "aff_bg_pos": (rng.random((2, n_dirs, n_pairs)) > 0.7).astype(np.float32),
        "aff_fg_pos": (rng.random((2, n_dirs, n_pairs)) > 0.7).astype(np.float32),
        "aff_neg": (rng.random((2, n_dirs, n_pairs)) > 0.7).astype(np.float32),
    }
    new_state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # trunk frozen, heads move
    from flax.traverse_util import flatten_dict

    old = flatten_dict(jax.tree_util.tree_map(np.asarray, state.params))
    new = flatten_dict(jax.tree_util.tree_map(np.asarray, new_state.params))
    trunk_moved = max(
        np.abs(old[k] - new[k]).max() for k in old if k[0] == "trunk"
    )
    edge_moved = max(
        np.abs(old[k] - new[k]).max() for k in old if k[0].startswith("fc_edge")
    )
    assert trunk_moved == 0.0
    assert edge_moved > 0.0


def test_multi_scale_flip_stacks():
    from tris_tpu.pseudo.aug import multi_scale_flip_stacks, pil_rescale

    rng = np.random.default_rng(0)
    img = (rng.random((40, 60, 3)) * 255).astype(np.uint8)
    stacks = multi_scale_flip_stacks(img, scales=(1.0, 0.5))
    assert len(stacks) == 2
    assert stacks[0].shape == (2, 40, 60, 3)
    np.testing.assert_array_equal(stacks[0][0], img.astype(np.float32))
    np.testing.assert_array_equal(stacks[0][1], img[:, ::-1].astype(np.float32))
    assert stacks[1].shape == (2, 20, 30, 3)
    np.testing.assert_array_equal(stacks[1][0], pil_rescale(img, 0.5, 3).astype(np.float32))


def test_ins_seg_multi_scale_consumption_path():
    """The exact consumption pattern run_make_ins_seg uses for non-unit
    scales: rescale the RAW image per scale, then normalize (the reference's
    MSF order). Guards against the helper being handed float arrays PIL
    cannot rescale."""
    from tris_tpu.pseudo.aug import multi_scale_flip_stacks
    from tris_tpu.pseudo.pipeline import normalize_image

    rng = np.random.default_rng(1)
    raw = (rng.random((40, 60, 3)) * 255).astype(np.uint8)
    img = normalize_image(multi_scale_flip_stacks(raw, (1.0, 0.5))[0][0])
    assert img.shape == (40, 60, 3) and img.dtype == np.float32
    np.testing.assert_allclose(img, normalize_image(raw), atol=1e-6)
    half = normalize_image(multi_scale_flip_stacks(raw, (0.5,))[0][0])
    assert half.shape == (20, 30, 3)


def test_irnet_bf16_trunk_option(irnet_setup):
    """``IRNet(trunk_dtype=bf16)`` must accept the SAME f32 variables
    (params/stats stay f32 — FrozenBatchNorm computes its affine in f32 and
    casts only the activation), return f32 outputs, and stay close to the
    f32 trunk. NOT the production default: the round-5 gating A/B on the
    real chip measured only 1.05x on the forward with 0.18% final
    ins_seg-label movement — rejected (tools/irn_trunk_dtype_ab.py,
    docs/PERF_NOTES.md round 5)."""
    model, variables = irnet_setup
    mbf = IRNet(trunk_dtype=jnp.bfloat16)
    img = jnp.asarray(np.random.default_rng(3).standard_normal((64, 64, 3)), jnp.float32)
    e32, d32 = edge_displacement_infer(model, variables, img)
    ebf, dbf = edge_displacement_infer(mbf, variables, img)
    assert ebf.dtype == jnp.float32 and dbf.dtype == jnp.float32
    assert float(jnp.abs(e32 - ebf).max()) < 0.05
    assert float(jnp.abs(d32 - dbf).max()) < 0.2
    # params untouched by the option: a state dict initialized by the bf16
    # model has the same leaves/dtypes (checkpoint compatibility)
    vbf = mbf.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ref_leaves = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), variables)
    bf_leaves = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vbf)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a == b, ref_leaves, bf_leaves))


def test_affinity_labels_on_device_match_host(rng):
    """The in-step device label build (train_irn.py::affinity_labels_on_device,
    fed a 16 KB quarter-scale label map) must produce EXACTLY the host
    tensors (pseudo/aug.py::affinity_labels_from_indices, ~24 MB/example) —
    it replaces them as the default feed."""
    from tris_tpu.pseudo.train_irn import affinity_labels_on_device

    pi = our_idx.PathIndex(5, (16, 16))
    labs = np.stack([
        rng.choice(np.array([0, 1, 255], np.uint8), (16, 16), p=[0.45, 0.35, 0.2])
        for _ in range(3)
    ])
    bg_d, fg_d, neg_d = affinity_labels_on_device(jnp.asarray(labs, jnp.int32), pi)
    for i in range(3):
        bg_h, fg_h, neg_h = affinity_labels_from_indices(
            labs[i], pi.src_indices, pi.dst_indices)
        np.testing.assert_array_equal(np.asarray(bg_d)[i], bg_h)
        np.testing.assert_array_equal(np.asarray(fg_d)[i], fg_h)
        np.testing.assert_array_equal(np.asarray(neg_d)[i], neg_h)


def test_irn_loss_reduced_label_equals_host_labels(rng):
    """One irn_loss evaluation fed ``reduced_label`` must equal the same
    batch fed precomputed host masks — identical losses AND gradients (the
    two feeds differ only in where the masks are built)."""
    from tris_tpu.pseudo.aug import affinity_labels_from_indices
    from tris_tpu.pseudo.train_irn import irn_loss

    crop, radius, B = 64, 4, 2
    pi = our_idx.PathIndex(radius, (crop // 4, crop // 4))
    model = IRNet()
    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, crop, crop, 3), np.float32))
    imgs = rng.standard_normal((B, crop, crop, 3)).astype(np.float32)
    labs = np.stack([
        rng.choice(np.array([0, 1, 255], np.uint8), (crop // 4, crop // 4),
                   p=[0.45, 0.35, 0.2]) for _ in range(B)])
    host = {"image": imgs}
    host["aff_bg_pos"], host["aff_fg_pos"], host["aff_neg"] = (
        np.stack(t) for t in zip(*[
            affinity_labels_from_indices(l, pi.src_indices, pi.dst_indices)
            for l in labs]))
    dev = {"image": imgs, "reduced_label": labs.astype(np.int32)}

    def loss_and_grad(batch):
        (l, m), g = jax.value_and_grad(irn_loss, has_aux=True)(
            variables["params"], variables.get("batch_stats", {}), model, pi, batch)
        return float(l), m, g

    l_h, m_h, g_h = loss_and_grad(host)
    l_d, m_d, g_d = loss_and_grad(dev)
    assert l_h == l_d, (l_h, l_d)
    for k in m_h:
        assert float(m_h[k]) == float(m_d[k]), k
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_h),
            jax.tree_util.tree_leaves_with_path(g_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(p1))


def test_path_max_slices_exact(rng):
    """The static-slice path-max (indexing.py::path_max_affinity_slices) must
    reproduce the flat-gather edge_to_affinity EXACTLY — same elements, same
    max — for both the batched training shape and the walk's unbatched
    padded-edge shape."""
    # training shape: [B, h, w]
    pi = our_idx.PathIndex(5, (20, 24))
    edge = jnp.asarray(rng.random((3, 20, 24)).astype(np.float32))
    ref = our_idx.edge_to_affinity(edge.reshape(3, -1), pi.path_indices)
    groups = our_idx.path_max_affinity_slices(edge, pi)
    got = jnp.concatenate([g.reshape(3, -1) for g in groups], axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # walk shape: unbatched padded edge at the padded PathIndex
    H, W, radius = 24, 20, 5
    pi_pad = our_idx._padded_path_index(radius, (H + radius, W + 2 * radius))
    ep = jnp.asarray(rng.random((H + radius, W + 2 * radius)).astype(np.float32))
    grids = []
    for ind in pi_pad.path_indices:
        gathered = ep.reshape(-1)[jnp.asarray(ind)]
        grids.append(1.0 - gathered.max(axis=1))
    ref_w = np.concatenate([np.asarray(g) for g in grids], axis=0)
    got_w = np.concatenate(
        [np.asarray(g) for g in our_idx.path_max_affinity_slices(ep, pi_pad)], axis=0)
    np.testing.assert_array_equal(got_w, ref_w)
