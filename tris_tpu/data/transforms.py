"""Host-side image/mask transforms (PIL + NumPy), matching the reference's
eval/train pipelines (`/root/reference/dataset/transform.py:13-63`).

- Images: square resize to ``size x size`` with PIL bilinear (torchvision's
  ``F.resize`` on PIL images), scale to [0, 1], normalize with ImageNet
  mean/std (transform.py:61-62 — the reference deliberately uses ImageNet
  stats, not CLIP stats).
- Masks: NEAREST-resized only for training; eval keeps the original size
  (transform.py:31-33).
- Output layout is NHWC float32 (TPU-native), not NCHW.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def load_image(path: str) -> Image.Image:
    return Image.open(path).convert("RGB")


def _native_jpeg():
    """The native fused decoder when built with libjpeg, else None.

    TRIS_NATIVE_DECODE=0 disables it; TRIS_FAST_DECODE=1 additionally enables
    DCT-domain scaled decode (approximate — the default native path is
    bit-identical to the PIL chain, test-pinned in tests/test_native.py)."""
    if os.environ.get("TRIS_NATIVE_DECODE", "1") != "1":
        return None
    try:
        from tris_tpu import native
        return native if native.jpeg_available() else None
    except Exception:
        return None


def load_transformed(path: str, size: int, normalize: bool = True) -> np.ndarray:
    """``image_to_array(load_image(path), size)`` as one fused native call
    when available (JPEG files only); PIL/numpy fallback otherwise. The two
    paths are bit-identical (test-pinned)."""
    nat = _native_jpeg()
    if nat is not None and path.lower().endswith((".jpg", ".jpeg")):
        try:
            with open(path, "rb") as f:
                data = f.read()
            mean, std = (IMAGENET_MEAN, IMAGENET_STD) if normalize else (None, None)
            fast = os.environ.get("TRIS_FAST_DECODE", "0") == "1"
            res = nat.jpeg_decode_resize_norm(data, size, mean, std, fast=fast)
            if res is not None:
                return res[0]
        except Exception:
            pass  # unreadable/corrupt: let the PIL path raise the real error
    return image_to_array(load_image(path), size, normalize=normalize)


def load_transformed_u8(path: str, size: int) -> np.ndarray:
    """Decode + bilinear-resize to [size, size, 3] uint8, WITHOUT normalizing.

    The u8 feed (``TRIS_U8_FEED=1``): the Loader ships 1 byte/pixel and the
    train/eval step normalizes on device (ops/normalize.py) — 4x less
    host->device traffic and batch-assembly memcpy than the f32 feed, at the
    cost of the normalize moving inside the XLA program (identical math in
    f32; bounded-ulp vs the host LUT, test-pinned). Resize still happens on
    the host in u8 (PIL semantics, byte-identical input to the normalize)."""
    nat = _native_jpeg()
    if nat is not None and path.lower().endswith((".jpg", ".jpeg")):
        try:
            with open(path, "rb") as f:
                data = f.read()
            fast = os.environ.get("TRIS_FAST_DECODE", "0") == "1"
            res = nat.jpeg_decode_resize_u8(data, size, fast=fast)
            if res is not None:
                return res[0]
            raw = nat.jpeg_decode(data)  # older .so: unfused decode
            if raw is not None:
                return np.asarray(
                    Image.fromarray(raw).resize((size, size), Image.BILINEAR))
        except Exception:
            pass
    return np.asarray(load_image(path).resize((size, size), Image.BILINEAR))


def image_to_array(img: Image.Image, size: int, normalize: bool = True) -> np.ndarray:
    """PIL image -> [size, size, 3] float32, normalized."""
    img = img.resize((size, size), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if normalize:
        arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return arr


def resize_mask_nearest(mask: np.ndarray, size: int) -> np.ndarray:
    """uint8 [H, W] -> [size, size] via PIL NEAREST (InterpolationMode.NEAREST)."""
    return np.asarray(Image.fromarray(mask.astype(np.uint8)).resize((size, size), Image.NEAREST))


def denormalize(arr: np.ndarray) -> np.ndarray:
    """Inverse of normalization, for visualization."""
    return np.clip(arr * IMAGENET_STD + IMAGENET_MEAN, 0.0, 1.0)
