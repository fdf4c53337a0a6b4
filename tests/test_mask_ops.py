import numpy as np
import pytest

from tris_tpu.data import mask_ops


def test_counts_string_roundtrip():
    for counts in ([0, 5, 10, 3], [100, 2000, 7, 1], [0, 48 * 64], [3, 1, 1, 1, 1, 2]):
        s = mask_ops.counts_to_string(counts)
        back = mask_ops.string_to_counts(s)
        np.testing.assert_array_equal(back, counts)


def test_rle_encode_decode_roundtrip(rng):
    for _ in range(5):
        m = (rng.random((23, 31)) > 0.6).astype(np.uint8)
        rle = mask_ops.rle_encode(m)
        back = mask_ops.rle_decode(rle)
        np.testing.assert_array_equal(back, m)
        assert mask_ops.rle_area(rle) == int(m.sum())


def test_rle_decode_column_major():
    # runs go down columns: 1 zero then 2 ones in a 3x2 mask
    rle = {"size": [3, 2], "counts": mask_ops.counts_to_string([1, 2, 3])}
    m = mask_ops.rle_decode(rle)
    want = np.array([[0, 0], [1, 0], [1, 0]], np.uint8)
    np.testing.assert_array_equal(m, want)


def test_polygon_rectangle():
    """Integer-cornered axis-aligned rectangle rasterizes to the half-open box,
    which is pycocotools' behavior for e.g. [1,1, 4,1, 4,3, 1,3]."""
    h, w = 8, 8
    poly = [1, 1, 4, 1, 4, 3, 1, 3]
    m = mask_ops.rle_decode(mask_ops.polygon_to_rle(poly, h, w))
    want = np.zeros((h, w), np.uint8)
    want[1:3, 1:4] = 1
    np.testing.assert_array_equal(m, want)


def test_polygon_full_image():
    h, w = 6, 5
    poly = [0, 0, w, 0, w, h, 0, h]
    m = mask_ops.rle_decode(mask_ops.polygon_to_rle(poly, h, w))
    assert m.sum() == h * w


def test_polygon_triangle_reasonable():
    h, w = 32, 32
    poly = [2, 2, 28, 2, 2, 28]
    m = mask_ops.rle_decode(mask_ops.polygon_to_rle(poly, h, w))
    # triangle area = 26*26/2 = 338; boundary discretization within a few %
    assert abs(int(m.sum()) - 338) < 30
    # interior points inside, far outside points out
    assert m[5, 5] == 1 and m[10, 10] == 1 and m[20, 5] == 1
    assert m[30, 30] == 0 and m[0, 0] == 0


def test_segmentation_multi_polygon_sum():
    h, w = 10, 10
    seg = [[0, 0, 4, 0, 4, 4, 0, 4], [6, 6, 9, 6, 9, 9, 6, 9]]
    m = mask_ops.segmentation_to_mask(seg, h, w)
    assert m[1, 1] == 1 and m[7, 7] == 1 and m[5, 5] == 0


def test_parity_with_pycocotools_if_available(rng):
    pycocotools = pytest.importorskip("pycocotools.mask")
    for _ in range(10):
        pts = rng.random(12) * 30
        poly = pts.tolist()
        ours = mask_ops.rle_decode(mask_ops.polygon_to_rle(poly, 32, 32))
        theirs = pycocotools.decode(pycocotools.frPyObjects([poly], 32, 32))[:, :, 0]
        np.testing.assert_array_equal(ours, theirs)
