"""On-device image normalization for the u8 feed (``TRIS_U8_FEED=1``).

The reference normalizes on the host inside the data pipeline
(/root/reference/dataset/transform.py:61-62). The TPU-shaped alternative
ships the resized uint8 image (1 byte/pixel — 4x less H2D bandwidth and
host memcpy than normalized f32) and folds ``((v/255) - mean) / std`` into
the XLA program as one fused multiply-add per channel. Same math in f32;
differs from the host LUT only in rounding order (bounded at a few ulp,
pinned by tests/test_data.py::test_device_normalize_matches_host).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tris_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

# ((v / 255) - mean) / std  ==  v * scale + bias
_SCALE = np.asarray(1.0 / (255.0 * np.asarray(IMAGENET_STD)), np.float32)
_BIAS = np.asarray(-np.asarray(IMAGENET_MEAN) / np.asarray(IMAGENET_STD), np.float32)


def image_input_to_f32(image: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] uint8 -> ImageNet-normalized float32; float input passes
    through unchanged (the default f32 feed is already normalized)."""
    if image.dtype == jnp.uint8:
        return image.astype(jnp.float32) * jnp.asarray(_SCALE) + jnp.asarray(_BIAS)
    return image
