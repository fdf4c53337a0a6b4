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
    msgs = [r for r in rec if "numpy permutohedral lattice" in str(r.message)]
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


# ---------------------------------------------------------------------------
# Fused JPEG decode + Pillow-exact resize + normalize (native/tris_jpeg.cpp)
# ---------------------------------------------------------------------------

jpeg_built = native.available() and native.jpeg_available()


def _smooth_rgb(rng, h, w, gray=False):
    """Blobby low-frequency image (JPEG-friendly, like a photo)."""
    import scipy.ndimage as ndi

    base = rng.random((h // 8 + 2, w // 8 + 2, 1 if gray else 3)) * 255
    up = ndi.zoom(base, (8, 8, 1), order=1)[:h, :w]
    return np.clip(up, 0, 255).astype(np.uint8)


def _jpeg_bytes(arr, quality=90):
    import io

    from PIL import Image

    img = Image.fromarray(arr[..., 0] if arr.shape[-1] == 1 else arr,
                          "L" if arr.shape[-1] == 1 else "RGB")
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_resize_bilinear_matches_pil_exactly(rng):
    from PIL import Image

    for h, w, oh, ow in [(480, 640, 320, 320), (123, 77, 320, 320),
                         (320, 320, 224, 224), (100, 100, 300, 300),
                         (480, 640, 480, 320), (7, 9, 320, 320)]:
        arr = rng.integers(0, 256, (h, w, 3), np.uint8)
        pil = np.asarray(Image.fromarray(arr).resize((ow, oh), Image.BILINEAR))
        out = native.resize_bilinear_u8(arr, oh, ow)
        np.testing.assert_array_equal(out, pil)
    # single-channel path (mask-style)
    m = rng.integers(0, 2, (41, 67), np.uint8) * 255
    pil = np.asarray(Image.fromarray(m).resize((320, 320), Image.BILINEAR))
    np.testing.assert_array_equal(native.resize_bilinear_u8(m, 320, 320), pil)


@pytest.mark.skipif(not jpeg_built, reason="built without libjpeg")
def test_jpeg_decode_matches_pil_exactly(rng):
    import io

    from PIL import Image

    for h, w, gray, q in [(480, 640, False, 90), (427, 640, False, 75),
                          (375, 500, True, 90), (123, 77, False, 95)]:
        data = _jpeg_bytes(_smooth_rgb(rng, h, w, gray), quality=q)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        out = native.jpeg_decode(data)
        assert out is not None and out.shape == (h, w, 3)
        np.testing.assert_array_equal(out, pil)
    assert native.jpeg_decode(b"not a jpeg") is None


@pytest.mark.skipif(not jpeg_built, reason="built without libjpeg")
def test_fused_decode_resize_norm_bitwise_matches_pil_chain(rng, tmp_path):
    """The whole Loader image path: native fused call vs transforms.py's
    PIL/numpy chain must be BIT-identical (exact mode)."""
    from tris_tpu.data.transforms import (IMAGENET_MEAN, IMAGENET_STD,
                                          image_to_array, load_image,
                                          load_transformed)

    for i, (h, w, gray) in enumerate([(480, 640, False), (375, 500, True), (99, 131, False)]):
        path = str(tmp_path / f"img{i}.jpg")
        with open(path, "wb") as f:
            f.write(_jpeg_bytes(_smooth_rgb(rng, h, w, gray)))
        ref = image_to_array(load_image(path), 320)
        with open(path, "rb") as f:
            res = native.jpeg_decode_resize_norm(f.read(), 320, IMAGENET_MEAN, IMAGENET_STD)
        assert res is not None
        arr, (oh, ow) = res
        assert (oh, ow) == (h, w)
        np.testing.assert_array_equal(arr, ref)  # bitwise
        # and via the Loader-facing wrapper (native path active)
        np.testing.assert_array_equal(load_transformed(path, 320), ref)


@pytest.mark.skipif(not jpeg_built, reason="built without libjpeg")
def test_fast_decode_close_to_exact(rng):
    """DCT-scaled fast mode is approximate: quantify agreement with the exact
    chain at the Loader's operating point (COCO-size -> 320px)."""
    from tris_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    worst = 0.0
    for _ in range(3):
        data = _jpeg_bytes(_smooth_rgb(rng, 480, 640))
        exact, _ = native.jpeg_decode_resize_norm(data, 320, IMAGENET_MEAN, IMAGENET_STD)
        fast, _ = native.jpeg_decode_resize_norm(data, 320, IMAGENET_MEAN, IMAGENET_STD, fast=True)
        # normalized units: 1/255 of the [0,1] scale is ~0.0175 after /std
        worst = max(worst, float(np.abs(exact - fast).mean()))
    assert worst < 0.05  # mean |d| well under 3 gray levels


@pytest.mark.skipif(not jpeg_built, reason="built without libjpeg")
def test_native_decode_disabled_by_env(rng, tmp_path, monkeypatch):
    from tris_tpu.data import transforms

    path = str(tmp_path / "img.jpg")
    with open(path, "wb") as f:
        f.write(_jpeg_bytes(_smooth_rgb(rng, 64, 64)))
    monkeypatch.setenv("TRIS_NATIVE_DECODE", "0")
    ref = transforms.image_to_array(transforms.load_image(path), 32)
    np.testing.assert_array_equal(transforms.load_transformed(path, 32), ref)


@pytest.mark.skipif(not jpeg_built, reason="built without libjpeg")
def test_fused_decode_resize_u8_bitwise_matches_pil_chain(rng, tmp_path):
    """The u8 feed's host half (TRIS_U8_FEED): the fused native decode +
    u8 resize must be BYTE-identical to PIL decode -> resize(BILINEAR), and
    the Loader-facing wrapper must route through it."""
    from PIL import Image

    from tris_tpu.data.transforms import load_image, load_transformed_u8

    for i, (h, w, gray) in enumerate([(480, 640, False), (375, 500, True)]):
        path = str(tmp_path / f"u8img{i}.jpg")
        with open(path, "wb") as f:
            f.write(_jpeg_bytes(_smooth_rgb(rng, h, w, gray)))
        ref = np.asarray(load_image(path).resize((320, 320), Image.BILINEAR))
        with open(path, "rb") as f:
            res = native.jpeg_decode_resize_u8(f.read(), 320)
        assert res is not None
        out, (oh, ow) = res
        assert (oh, ow) == (h, w) and out.dtype == np.uint8
        np.testing.assert_array_equal(out, ref)
        np.testing.assert_array_equal(load_transformed_u8(path, 320), ref)
