"""ctypes bindings for the native host library (native/tris_native.cpp).

Build with ``make -C native`` (g++ only; no external deps). Every entry point
has a pure-Python fallback elsewhere in the package; importing this module
raises if the shared library is absent, and callers catch that.
"""

from __future__ import annotations

import ctypes
import functools
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libtris_native.so")


@functools.lru_cache()
def _lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(_LIB_PATH)

    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i = ctypes.c_int
    f = ctypes.c_float

    lib.tris_rle_decode.argtypes = [u32p, i, i, i, u8p]
    lib.tris_rle_encode.argtypes = [u8p, i, i, u32p, i]
    lib.tris_rle_encode.restype = i
    lib.tris_polygon_to_rle.argtypes = [f64p, i, i, i, u32p, i]
    lib.tris_polygon_to_rle.restype = i
    lib.tris_connected_components.argtypes = [u8p, i, i, i32p]
    lib.tris_connected_components.restype = i
    lib.tris_dense_crf.argtypes = [u8p, f32p, i, i, i, i, f, f, f, f, f, f32p]
    lib.tris_dense_crf_multi.argtypes = [u8p, f32p, i, i, i, i, i, f, f, f, f, f, f32p]
    lib.tris_jpeg_available.restype = i
    lib.tris_resize_bilinear_u8.argtypes = [u8p, i, i, i, i, i, u8p]
    lib.tris_jpeg_probe.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                    ctypes.POINTER(ctypes.c_int32),
                                    ctypes.POINTER(ctypes.c_int32)]
    lib.tris_jpeg_probe.restype = i
    lib.tris_jpeg_decode_u8.argtypes = [ctypes.c_char_p, ctypes.c_size_t, u8p]
    lib.tris_jpeg_decode_u8.restype = i
    lib.tris_jpeg_decode_resize_norm.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, i,
        ctypes.c_void_p, ctypes.c_void_p, i, f32p, i32p]
    lib.tris_jpeg_decode_resize_norm.restype = i
    if hasattr(lib, "tris_jpeg_decode_resize_u8"):  # older .so builds lack it
        lib.tris_jpeg_decode_resize_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, i, i, u8p, i32p]
        lib.tris_jpeg_decode_resize_u8.restype = i
    return lib


def available() -> bool:
    try:
        _lib()
        return True
    except OSError:
        return False


def rle_decode(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    counts = np.ascontiguousarray(counts, np.uint32)
    out = np.zeros((h, w), np.uint8)
    _lib().tris_rle_decode(counts, len(counts), h, w, out)
    return out


def rle_encode(mask: np.ndarray) -> np.ndarray:
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    buf = np.zeros(h * w + 2, np.uint32)
    n = _lib().tris_rle_encode(mask, h, w, buf, len(buf))
    assert n >= 0
    return buf[:n].copy()


def polygon_to_counts(poly, h: int, w: int) -> np.ndarray:
    xy = np.ascontiguousarray(poly, np.float64)
    buf = np.zeros(h * w + 2, np.uint32)
    n = _lib().tris_polygon_to_rle(xy, len(xy) // 2, h, w, buf, len(buf))
    assert n >= 0
    return buf[:n].copy()


def connected_components(mask: np.ndarray):
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    labels = np.zeros((h, w), np.int32)
    n = _lib().tris_connected_components(mask, h, w, labels)
    return labels, int(n)


def jpeg_available() -> bool:
    """True when the library was built against libjpeg (native/Makefile)."""
    try:
        return bool(_lib().tris_jpeg_available())
    except OSError:
        return False


def resize_bilinear_u8(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Pillow-exact bilinear resize of a uint8 [H, W] or [H, W, C] array
    (byte-identical to ``Image.fromarray(img).resize((ow, oh), BILINEAR)``,
    test-pinned)."""
    squeeze = img.ndim == 2
    img = np.ascontiguousarray(img[..., None] if squeeze else img, np.uint8)
    h, w, c = img.shape
    out = np.empty((oh, ow, c), np.uint8)
    _lib().tris_resize_bilinear_u8(img, h, w, c, oh, ow, out)
    return out[..., 0] if squeeze else out


def jpeg_decode(data: bytes):
    """JPEG bytes -> RGB uint8 [H, W, 3], byte-identical to
    ``Image.open(...).convert("RGB")`` for RGB/grayscale JPEGs (test-pinned).
    Returns None when the file needs the PIL fallback (CMYK, corrupt, ...)."""
    lib = _lib()
    h, w = ctypes.c_int32(), ctypes.c_int32()
    if lib.tris_jpeg_probe(data, len(data), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.tris_jpeg_decode_u8(data, len(data), out) != 0:
        return None
    return out


def jpeg_decode_resize_norm(data: bytes, size: int, mean=None, std=None,
                            fast: bool = False):
    """Fused JPEG decode + square bilinear resize + normalize.

    Returns (float32 [size, size, 3], (orig_h, orig_w)) or None when the
    file needs the PIL fallback. With ``fast=False`` the result is
    bit-identical to the PIL/numpy chain in data/transforms.py (test-pinned);
    ``fast=True`` lets libjpeg reconstruct at a reduced DCT scale first
    (approximate — see tests/test_native.py for the measured agreement)."""
    lib = _lib()
    out = np.empty((size, size, 3), np.float32)
    hw = np.zeros(2, np.int32)
    if mean is not None:
        mean = np.ascontiguousarray(mean, np.float32)
        std = np.ascontiguousarray(std, np.float32)
        mp, sp = mean.ctypes.data, std.ctypes.data
    else:
        mp, sp = None, None
    rc = lib.tris_jpeg_decode_resize_norm(data, len(data), size, mp, sp,
                                          int(fast), out, hw)
    if rc != 0:
        return None
    return out, (int(hw[0]), int(hw[1]))


def jpeg_decode_resize_u8(data: bytes, size: int, fast: bool = False):
    """Fused JPEG decode + square bilinear resize to uint8 (no normalize) —
    the u8 feed's host half (TRIS_U8_FEED; device normalizes,
    ops/normalize.py). Byte-identical to PIL decode -> resize(BILINEAR)
    (test-pinned); returns (uint8 [size, size, 3], (orig_h, orig_w)) or None
    for the PIL fallback."""
    lib = _lib()
    if not hasattr(lib, "tris_jpeg_decode_resize_u8"):
        return None
    out = np.empty((size, size, 3), np.uint8)
    hw = np.zeros(2, np.int32)
    rc = lib.tris_jpeg_decode_resize_u8(data, len(data), size, int(fast), out, hw)
    if rc != 0:
        return None
    return out, (int(hw[0]), int(hw[1]))


class crf:
    """Namespace matching tris_tpu.pseudo.crf's native hook."""

    @staticmethod
    def dense_crf_inference(image: np.ndarray, unary: np.ndarray, n_iters: int,
                            gxy: float, gcompat: float, bxy: float, brgb: float,
                            bcompat: float) -> np.ndarray:
        image = np.ascontiguousarray(image, np.uint8)
        L, h, w = unary.shape
        unary = np.ascontiguousarray(unary.reshape(L, h * w), np.float32)
        out = np.zeros((L, h * w), np.float32)
        _lib().tris_dense_crf(image, unary, h, w, L, n_iters,
                              gxy, gcompat, bxy, brgb, bcompat, out)
        return out.reshape(L, h, w)

    @staticmethod
    def dense_crf_inference_multi(image: np.ndarray, unary: np.ndarray, n_iters: int,
                                  gxy: float, gcompat: float, bxy: float, brgb: float,
                                  bcompat: float) -> np.ndarray:
        """K fused mean-field problems over one image; unary: [K, L, h, w].

        Shares the permutohedral lattice construction (the dominant cost) and
        filters all K*L channels in one splat/blur/slice per kernel per
        iteration."""
        image = np.ascontiguousarray(image, np.uint8)
        K, L, h, w = unary.shape
        unary = np.ascontiguousarray(unary.reshape(K, L, h * w), np.float32)
        out = np.zeros((K, L, h * w), np.float32)
        _lib().tris_dense_crf_multi(image, unary, K, h, w, L, n_iters,
                                    gxy, gcompat, bxy, brgb, bcompat, out)
        return out.reshape(K, L, h, w)
