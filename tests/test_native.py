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
