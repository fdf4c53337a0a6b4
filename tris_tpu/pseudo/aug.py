"""Joint image/label augmentations + affinity-label extraction for IRNet
training (re-design of `/root/reference/IRNet/misc/imutils.py:8-167` and
`IRNet/voc12/dataloader.py:83-109`), driven by an explicit np.random.Generator.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from PIL import Image


def pil_resize(img: np.ndarray, size: Tuple[int, int], order: int) -> np.ndarray:
    if size[0] == img.shape[0] and size[1] == img.shape[1]:
        return img
    resample = Image.BICUBIC if order == 3 else Image.NEAREST
    return np.asarray(Image.fromarray(img).resize(size[::-1], resample))


def pil_rescale(img: np.ndarray, scale: float, order: int) -> np.ndarray:
    h, w = img.shape[:2]
    return pil_resize(img, (int(np.round(h * scale)), int(np.round(w * scale))), order)


def random_scale_pair(img, label, scale_range, rng: np.random.Generator):
    s = scale_range[0] + rng.random() * (scale_range[1] - scale_range[0])
    return pil_rescale(img, s, 3), pil_rescale(label, s, 0)


def random_lr_flip_pair(img, label, rng: np.random.Generator):
    if rng.integers(2):
        return np.fliplr(img), np.fliplr(label)
    return img, label


def _random_crop_box(imgsize, cropsize, rng: np.random.Generator):
    h, w = imgsize
    ch, cw = min(cropsize, h), min(cropsize, w)
    wsp, hsp = w - cropsize, h - cropsize
    if wsp > 0:
        cont_left, img_left = 0, int(rng.integers(wsp + 1))
    else:
        cont_left, img_left = int(rng.integers(-wsp + 1)), 0
    if hsp > 0:
        cont_top, img_top = 0, int(rng.integers(hsp + 1))
    else:
        cont_top, img_top = int(rng.integers(-hsp + 1)), 0
    return cont_top, cont_left, img_top, img_left, ch, cw


def _crop(img: np.ndarray, cropsize: int, default, box):
    cont_top, cont_left, img_top, img_left, ch, cw = box
    shape = (cropsize, cropsize) + img.shape[2:]
    out = np.full(shape, default, dtype=img.dtype)
    out[cont_top : cont_top + ch, cont_left : cont_left + cw] = (
        img[img_top : img_top + ch, img_left : img_left + cw]
    )
    return out


def random_crop_pair(img, label, cropsize: int, rng: np.random.Generator,
                     defaults=(0, 255)):
    box = _random_crop_box(img.shape[:2], cropsize, rng)
    return _crop(img, cropsize, defaults[0], box), _crop(label, cropsize, defaults[1], box)


def top_left_crop(img: np.ndarray, cropsize: int, default) -> np.ndarray:
    box = (0, 0, 0, 0, min(cropsize, img.shape[0]), min(cropsize, img.shape[1]))
    return _crop(img, cropsize, default, box)


def affinity_labels_from_indices(
    label_map: np.ndarray,
    indices_from: np.ndarray,
    indices_to: np.ndarray,
    max_valid: int = 21,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ir label map (quarter scale) -> (bg_pos, fg_pos, neg) affinity labels,
    each [n_dirs, n_pairs] float32 (voc12/dataloader.py:83-109). Labels are
    {0 bg, 1 fg, 255 ignore}; 255 >= max_valid marks invalid pairs."""
    flat = label_map.reshape(-1)
    lab_from = flat[indices_from][None]       # [1, n_pairs]
    lab_to = flat[indices_to]                 # [n_dirs, n_pairs]
    valid = (lab_from < max_valid) & (lab_to < max_valid)
    equal = lab_from == lab_to
    pos = equal & valid
    bg_pos = (pos & (lab_from == 0)).astype(np.float32)
    fg_pos = (pos & (lab_from > 0)).astype(np.float32)
    neg = (~equal & valid).astype(np.float32)
    return bg_pos, fg_pos, neg


def multi_scale_flip_stacks(img: np.ndarray, scales=(1.0,)) -> list:
    """Per-scale horizontal-flip stacks of a RAW (uint8) HWC image
    (``ReferClassificationDatasetMSF.__getitem__``, voc12/dataloader.py:304-348
    — the reference also rescales the raw image and normalizes afterwards).

    Returns ``[ [2, H_s, W_s, C] float32 per scale ]``: index 0 of each stack
    is the image at that scale (bicubic rescale for s != 1), index 1 its
    left-right flip. The reference's live ins-seg pass instantiates this at
    ``scales=(1.0,)`` and consumes only the first scale's stack
    (make_ins_seg_labels.py:126,177-179) — flip averaging happens inside
    ``EdgeDisplacement`` — so non-unit scales are a hook for multi-scale
    inference, not part of the released pipeline.
    """
    out = []
    for s in scales:
        s_img = img if s == 1 else pil_rescale(img, s, 3)
        s_img = s_img.astype(np.float32)
        out.append(np.stack([s_img, s_img[:, ::-1]], axis=0))
    return out
