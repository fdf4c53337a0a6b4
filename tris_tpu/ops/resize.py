"""Bilinear / nearest image resize with exact torch ``F.interpolate`` semantics.

The reference uses both conventions and mixing them up shifts masks by up to a
pixel, which moves mIoU:

- ``align_corners=False`` (half-pixel): model-internal upsampling
  (`/root/reference/model/utils.py:5-10`), positional-embedding resize
  (`CLIP/clip/model.py:76`).
- ``align_corners=True``: eval-time upsampling to the original image size and
  the 224px CAM/image resample for the CLIP critic
  (`/root/reference/validate.py:180,304,318-320`, `train_stage1.py:328-329`).

TPU-first design: resizes are expressed as two small dense matmuls
``out = A_h @ img @ A_w.T`` instead of gathers. For static shapes the
interpolation matrices fold into XLA constants and the work runs on the MXU,
which is much faster than gather/scatter on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=512)
def _resize_matrix_np(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense [out_size, in_size] row-stochastic linear interpolation matrix."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    out_idx = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), dtype=np.float64)
        else:
            src = out_idx * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (out_idx + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    mat[rows, lo] += (1.0 - frac).astype(np.float32)
    mat[rows, hi] += frac.astype(np.float32)
    return mat


def resize_matrix(in_size: int, out_size: int, align_corners: bool) -> jnp.ndarray:
    return jnp.asarray(_resize_matrix_np(in_size, out_size, align_corners))


def bilinear_resize(x: jnp.ndarray, size: tuple, align_corners: bool = False) -> jnp.ndarray:
    """Resize the trailing two spatial dims of ``[..., H, W]`` to ``size``.

    Equivalent to ``torch.nn.functional.interpolate(mode='bilinear')`` for both
    ``align_corners`` settings.
    """
    out_h, out_w = int(size[0]), int(size[1])
    in_h, in_w = x.shape[-2], x.shape[-1]
    if (in_h, in_w) == (out_h, out_w):
        return x
    dt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    xf = x.astype(dt)
    ah = resize_matrix(in_h, out_h, align_corners).astype(dt)
    aw = resize_matrix(in_w, out_w, align_corners).astype(dt)
    # [..., H, W] -> [..., out_h, W] -> [..., out_h, out_w]
    # HIGHEST precision: interpolation weights must not be rounded to bf16.
    hp = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,...hw->...ow", ah, xf, precision=hp)
    y = jnp.einsum("pw,...ow->...op", aw, y, precision=hp)
    return y


def nearest_resize(x: jnp.ndarray, size: tuple, exact: bool = True) -> jnp.ndarray:
    """Nearest-neighbour resize of ``[..., H, W]``.

    ``exact=True`` matches PIL / ``InterpolationMode.NEAREST`` on PIL images
    (half-pixel centers), which the reference data pipeline uses for masks
    (`dataset/transform.py:32`). ``exact=False`` matches
    ``F.interpolate(mode='nearest')`` (floor of ``i * in/out``).
    """
    out_h, out_w = int(size[0]), int(size[1])
    in_h, in_w = x.shape[-2], x.shape[-1]
    if (in_h, in_w) == (out_h, out_w):
        return x

    def src_index(out_size: int, in_size: int) -> np.ndarray:
        idx = np.arange(out_size, dtype=np.float64)
        scale = in_size / out_size
        if exact:
            src = np.minimum(((idx + 0.5) * scale).astype(np.int64), in_size - 1)
        else:
            src = np.minimum(np.floor(idx * scale).astype(np.int64), in_size - 1)
        return src

    rows = jnp.asarray(src_index(out_h, in_h))
    cols = jnp.asarray(src_index(out_w, in_w))
    return x[..., rows, :][..., :, cols]


def adaptive_max_pool_11(x: jnp.ndarray) -> jnp.ndarray:
    """``F.adaptive_max_pool2d(x, (1, 1))`` over trailing [H, W] dims."""
    return jnp.max(x, axis=(-2, -1), keepdims=True)
