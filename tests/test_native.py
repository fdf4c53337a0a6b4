"""Native C++ library tests (skipped when native/ hasn't been built)."""

import numpy as np
import pytest

native = pytest.importorskip("tris_tpu.native")
if not native.available():
    pytest.skip("libtris_native.so not built (make -C native)", allow_module_level=True)

from scipy import ndimage

from tris_tpu.data import mask_ops
from tris_tpu.pseudo.crf import unary_from_labels


def test_rle_roundtrip_vs_python(rng):
    for _ in range(5):
        m = (rng.random((37, 53)) > 0.5).astype(np.uint8)
        counts_c = native.rle_encode(m)
        counts_py = mask_ops.string_to_counts(mask_ops.rle_encode(m)["counts"])
        np.testing.assert_array_equal(counts_c, counts_py)
        np.testing.assert_array_equal(native.rle_decode(counts_c, 37, 53), m)


def test_polygon_parity_vs_python(rng):
    # compare against the pure-numpy COCO implementation (which itself is
    # validated against pycocotools when available)
    import importlib

    from tris_tpu.data import mask_ops as mo

    for _ in range(20):
        poly = (rng.random(12) * 30).tolist()
        counts_c = native.polygon_to_counts(poly, 32, 32)
        # bypass the native fast path inside polygon_to_rle
        with_nat = mo._native
        try:
            mo._native = lambda: None
            py = mo.string_to_counts(mo.polygon_to_rle(poly, 32, 32)["counts"])
        finally:
            mo._native = with_nat
        np.testing.assert_array_equal(counts_c, py)


def test_connected_components_vs_scipy(rng):
    for _ in range(5):
        m = (rng.random((40, 40)) > 0.5).astype(np.uint8)
        lab_c, n_c = native.connected_components(m)
        lab_s, n_s = ndimage.label(m)
        assert n_c == n_s
        # identical partitions up to label permutation
        pairs = set(zip(lab_c.ravel().tolist(), lab_s.ravel().tolist()))
        assert len({a for a, b in pairs}) == len(pairs)
        assert len({b for a, b in pairs}) == len(pairs)


def _blobby_image(rng, h, w):
    """COCO-ish synthetic photo: a few smooth color regions + texture noise."""
    img = np.zeros((h, w, 3), np.float32)
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    for _ in range(4):
        cy, cx = rng.random() * h, rng.random() * w
        ry, rx = 10 + rng.random() * h / 2, 10 + rng.random() * w / 2
        blob = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
        img[blob] = rng.integers(30, 225, 3)
    img += rng.normal(0, 6, img.shape)
    # smooth slightly so regions have soft internal gradients like photos
    img = ndimage.gaussian_filter(img, (1.5, 1.5, 0))
    return np.clip(img, 0, 255).astype(np.uint8)


def _cam_like(rng, h, w):
    """A response-map-shaped float map in [0, 1] peaked on a region."""
    cy, cx = rng.random() * h, rng.random() * w
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    cam = np.exp(-(((yy - cy) / (h / 4)) ** 2 + ((xx - cx) / (w / 4)) ** 2))
    cam += 0.1 * rng.random((h, w)).astype(np.float32)
    return (cam / cam.max()).astype(np.float32)


def test_crf_backends_cross_agree(rng, monkeypatch):
    """The native C++ permutohedral lattice and the pure-numpy lattice
    fallback are silently interchangeable in pseudo/crf.py — pin that they
    agree on mean-field Q and on the derived ir_label maps at the reference
    thresholds (fg 0.3 / bg 0.1, IRNet/run_sample_refer.py:65-66).

    Both implement the same Adams et al. 2010 lattice, so agreement is float
    rounding: measured over 10 seeds at 96x128, max |dQ| <= 4e-6 and ir_label
    agreement 1.0 (the earlier scipy bilateral-grid fallback bottomed out at
    79% label agreement and was replaced)."""
    from tris_tpu.pseudo import crf as crf_mod
    from tris_tpu.pseudo.labels import cam_to_ir_label

    h, w = 96, 128
    for seed in range(3):
        r = np.random.default_rng(seed)
        img = _blobby_image(r, h, w)
        cam = _cam_like(r, h, w)

        seeds = np.stack([
            np.argmax(np.concatenate([np.full((1, h, w), t), cam[None]], 0), 0)
            for t in (0.3, 0.1)
        ]).astype(np.int32)
        unaries = np.stack([unary_from_labels(s, 2) for s in seeds])

        q_native = crf_mod.dense_crf_inference_multi(img, unaries)
        lab_native = cam_to_ir_label(img, cam)
        monkeypatch.setattr(crf_mod, "_native", lambda: None)
        q_scipy = crf_mod.dense_crf_inference_multi(img, unaries)
        lab_scipy = cam_to_ir_label(img, cam)
        monkeypatch.undo()

        dq = np.abs(q_native - q_scipy)
        assert dq.max() < 1e-3, f"seed {seed}: max |dQ| {dq.max():.6f}"
        agree = (lab_native == lab_scipy).mean()
        assert agree >= 0.9999, f"seed {seed}: ir_label agreement {agree:.4f}"


def test_crf_fallback_warns_once(monkeypatch):
    """Silent-fallback fix: dropping off the native path emits one warning."""
    import warnings as _warnings

    from tris_tpu.pseudo import crf as crf_mod

    def broken_lib():
        raise OSError("forced for test")

    monkeypatch.setattr("tris_tpu.native._lib", broken_lib)
    monkeypatch.setattr(crf_mod, "_warned_fallback", False)
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        assert crf_mod._native() is None
        assert crf_mod._native() is None
    msgs = [r for r in rec if "scipy bilateral-grid" in str(r.message)]
    assert len(msgs) == 1


def test_dense_crf_heals_noise(rng):
    h, w = 96, 96
    img = np.full((h, w, 3), 30, np.uint8)
    img[24:72, 24:72] = 200
    img = (img + rng.integers(0, 8, img.shape)).astype(np.uint8)
    labels = np.zeros((h, w), np.int32)
    labels[24:72, 24:72] = 1
    labels[40, 40] = 0
    labels[5, 5] = 1
    u = unary_from_labels(labels, 2).reshape(2, h, w)
    Q = native.crf.dense_crf_inference(img, u, 10, 3.0, 3.0, 50.0, 5.0, 10.0)
    assert Q.shape == (2, h, w)
    np.testing.assert_allclose(Q.sum(0), 1.0, atol=1e-4)
    out = np.argmax(Q, axis=0)
    assert out[40, 40] == 1 and out[5, 5] == 0
    assert out[10, 10] == 0 and out[48, 48] == 1
    assert abs(out.mean() - 0.25) < 0.02
