import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from tris_tpu.ops.resize import adaptive_max_pool_11, bilinear_resize, nearest_resize


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((10, 10), (20, 20)), ((7, 5), (13, 17)), ((224, 224), (320, 320)), ((32, 48), (8, 12))],
)
def test_bilinear_matches_torch(rng, align, in_hw, out_hw):
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    want = TF.interpolate(torch.from_numpy(x), out_hw, mode="bilinear", align_corners=align).numpy()
    got = np.asarray(bilinear_resize(x, out_hw, align_corners=align))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_bilinear_identity(rng):
    x = rng.standard_normal((1, 2, 16, 16)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(bilinear_resize(x, (16, 16))), x)


@pytest.mark.parametrize("in_hw,out_hw", [((10, 10), (4, 4)), ((31, 17), (8, 8)), ((6, 6), (13, 13))])
def test_nearest_exact_matches_torch(rng, in_hw, out_hw):
    x = (rng.random(in_hw) > 0.5).astype(np.float32)[None, None]
    want = TF.interpolate(torch.from_numpy(x), out_hw, mode="nearest-exact").numpy()
    got = np.asarray(nearest_resize(x, out_hw, exact=True))
    np.testing.assert_array_equal(got, want)


def test_nearest_floor_matches_torch(rng):
    x = rng.standard_normal((1, 1, 9, 9)).astype(np.float32)
    want = TF.interpolate(torch.from_numpy(x), (5, 5), mode="nearest").numpy()
    got = np.asarray(nearest_resize(x, (5, 5), exact=False))
    np.testing.assert_array_equal(got, want)


def test_adaptive_max_pool(rng):
    x = rng.standard_normal((2, 4, 7, 9)).astype(np.float32)
    want = TF.adaptive_max_pool2d(torch.from_numpy(x), (1, 1)).numpy()
    got = np.asarray(adaptive_max_pool_11(x))
    np.testing.assert_allclose(got, want, atol=1e-6)
