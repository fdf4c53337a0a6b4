"""Single-image demo (re-design of `/root/reference/demo.py`).

``python -m tris_tpu.cli.demo --img figs/demo.png --text 'man on the right'
--pretrain weights/stage2.msgpack``

Loads the stage-2 model, runs one forward at 320px, bilinearly upsamples to
the original size (align_corners=True), min-max normalizes, and saves a JET
heatmap overlay to ``figs/demo_({text}).png`` (demo.py:28-48,90-100).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from tris_tpu.cli.common import build_stage2, load_pretrained
from tris_tpu.config import get_parser
from tris_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from tris_tpu.eval.validate import resize_to_original_np
from tris_tpu.tokenizer import tokenize


def get_norm_cam(cam: np.ndarray) -> np.ndarray:
    """Min-max normalize a relu'd CAM (demo.py:41-48)."""
    cam = np.maximum(cam, 0.0)
    lo, hi = cam.min(), cam.max()
    return (cam - lo) / (hi - lo + 1e-5)


def visualize_cam(norm_cam: np.ndarray, original_bgr: np.ndarray, root: str = None):
    """JET overlay 0.6 heat / 0.4 image (demo.py:28-39)."""
    import cv2

    heat = cv2.applyColorMap(np.uint8(norm_cam * 255), cv2.COLORMAP_JET)
    img = cv2.addWeighted(heat, 0.6, cv2.cvtColor(original_bgr, cv2.COLOR_RGB2BGR), 0.4, 0)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if root is None:
        return img
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(root) or ".", exist_ok=True)
    plt.imsave(root, img)
    return img


def prepare_data(img_path: str, text: str, size: int = 320, max_length: int = 20):
    """cv2 BGR read + comma-concat multi-phrase tokenization (demo.py:50-68).

    The reference tokenizes each comma-separated phrase to max_length and
    concatenates them into one flat id sequence."""
    import cv2

    bgr = cv2.imread(img_path)
    h, w = bgr.shape[:2]
    ids = [tokenize(t, context_length=77)[0, :max_length] for t in text.split(",")]
    word_ids = np.concatenate(ids).astype(np.int32)

    img = cv2.resize(bgr, (size, size), interpolation=cv2.INTER_LINEAR).astype(np.float32)
    img = (img / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return img, word_ids, h, w, bgr


def main(args):
    size, max_length = 320, args.max_query_len
    args.size = size
    model, variables = build_stage2(args, train=False)
    if args.pretrain:
        variables = load_pretrained(args, model, variables, "stage2")
    eval_vars = {k: variables[k] for k in ("params", "batch_stats") if k in variables}

    img, word_ids, h, w, bgr = prepare_data(args.img, args.text, size, max_length)
    out = model.apply(eval_vars, jnp.asarray(img)[None], jnp.asarray(word_ids)[None],
                      train=False)  # [1, H, W, 1]
    pred = resize_to_original_np(np.asarray(out)[0, :, :, 0], h, w)
    norm_cam = get_norm_cam(pred)
    root = f"figs/demo_({args.text}).png"
    visualize_cam(norm_cam, bgr, root=root)
    print(f"saved {root}")
    return norm_cam


if __name__ == "__main__":
    main(get_parser().parse_args())
