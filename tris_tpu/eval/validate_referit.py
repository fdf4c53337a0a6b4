"""ReferIt evaluation (re-design of `/root/reference/validate_referit.py`).

Protocol: per image, every (≥5%-area) expression is evaluated independently —
forward at 320px, bilinear resize to the original size (align_corners=True),
per-map max-normalize, threshold > 1e-9; metrics are mIoU/oIoU/Hit/HitM plus
Prec@{0.5..0.9} (validate_referit.py:133-191). All expressions of one image
run in a single jitted forward.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from tris_tpu.eval.metrics import SegEvalAccumulator
from tris_tpu.eval.validate import make_eval_forward, normalize_threshold, resize_to_original_np


def validate_referit(model, variables, dataset, max_tokens: int = 20,
                     print_freq: int = 100, log=print) -> dict:
    """Metrics stay on host here (unlike validate.py's device paths): ReferIt
    iterates per image with per-ref masks and possibly multiple gt boxes, and
    original sizes are only known after image load, so a static padded device
    program would recompile per size. The one-deep dispatch pipeline below
    still overlaps chip and host."""
    forward = make_eval_forward(model)
    acc = SegEvalAccumulator(with_boxes=False)
    step = 0

    def process(cams_dev, refs, S, oh, ow):
        cams = np.asarray(cams_dev)[0][:S]  # blocks on this image's device work
        for j, ref in enumerate(refs):
            cam = resize_to_original_np(cams[j], oh, ow)
            cam_norm, pred = normalize_threshold(cam)
            bbox = np.asarray(ref["bbox"], np.float64).reshape(-1, 4)
            acc.add(ref["mask"], pred, cam_norm.astype(np.float32), bbox, weight=1)

    # one-deep software pipeline: the next image's forward is dispatched
    # (async) before the current image's host metric chain runs
    pending = None
    for ex in dataset.iter_examples():
        refs = ex["refs"]
        if not refs:
            continue
        image = jnp.asarray(ex["image"])[None]
        ids = np.stack([r["word_ids"] for r in refs])  # [S, L]
        S = ids.shape[0]
        # pad S to a bucket so jit compiles once per bucket, not per count
        bucket = 1 << max(0, (S - 1).bit_length())
        if bucket > S:
            ids = np.concatenate([ids, np.zeros((bucket - S, ids.shape[1]), ids.dtype)])
        out = forward(variables, image, jnp.asarray(ids[None]))
        if pending is not None:
            process(*pending)
            step += 1
            if step % print_freq == 0:
                r = acc.results()
                log(f"referit [{step}] mIoU {r['mIoU']:.3f} oIoU {r['oIoU']:.3f} "
                    f"P@0.5 {r['prec@0.5']:.3f}")
        pending = (out, refs, S, ex["orig_size"][0], ex["orig_size"][1])
    if pending is not None:
        process(*pending)
    return acc.results()
