"""Synthetic RefCOCO-style dataset fixture for end-to-end data-layer tests."""

import json
import os
import pickle

import numpy as np
from PIL import Image


def make_fake_refcoco(root, n_images=6, img_hw=(48, 64), dataset="refcoco", splitBy="unc",
                      learnable=False):
    """Create a miniature refer/<dataset> tree with rectangle-polygon objects.

    Each image gets 2 refs (two rectangles); refs alternate train/val/testA/testB.
    Returns (data_root, expected) where expected maps ref_id -> rect mask info.

    ``learnable=True`` renders each category's rectangle as a distinct solid
    color on a dim noisy background (instead of pure noise images), giving
    the weakly-supervised stage-1 objective a real visual signal to localize —
    used by the overfit tests in tests/test_learning.py.
    """
    h, w = img_hw
    data_dir = os.path.join(root, "refer", dataset)
    img_dir = os.path.join(root, "train2014")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)

    rng = np.random.default_rng(7)
    images, annotations, refs = [], [], []
    expected = {}
    splits = ["train", "train", "train", "val", "testA", "testB"]
    sent_id = 0
    for i in range(n_images):
        image_id = i + 1
        file_name = f"COCO_train2014_{image_id:012d}.jpg"
        if learnable:
            arr = rng.integers(0, 60, (h, w, 3), dtype=np.uint8)  # dim noise bg
            colors = [(220, 40, 40), (40, 220, 40)]  # category 1 / 2
            for k in range(2):
                x0, y0 = 4 + 20 * k, 6 + 8 * k
                arr[y0 : y0 + 12, x0 : x0 + 14] = colors[k]
        else:
            arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, file_name))
        images.append({"id": image_id, "height": h, "width": w, "file_name": file_name})

        for k in range(2):
            ann_id = image_id * 10 + k
            ref_id = image_id * 100 + k
            x0, y0 = 4 + 20 * k, 6 + 8 * k
            bw, bh = 14, 12
            poly = [x0, y0, x0 + bw, y0, x0 + bw, y0 + bh, x0, y0 + bh]
            annotations.append({
                "id": ann_id,
                "image_id": image_id,
                "category_id": 1 + k,
                "bbox": [x0, y0, bw, bh],
                "segmentation": [poly],
                "area": bw * bh,
                "iscrowd": 0,
            })
            sents = []
            for t, text in enumerate([f"object {k} in image {image_id}", f"the thing {k}"]):
                sents.append({
                    "sent": text,
                    "sent_id": sent_id,
                    "tokens": text.split(),
                })
                sent_id += 1
            refs.append({
                "ref_id": ref_id,
                "ann_id": ann_id,
                "image_id": image_id,
                "category_id": 1 + k,
                "split": splits[i % len(splits)],
                "sentences": sents,
                "sent_ids": [s["sent_id"] for s in sents],
            })
            expected[ref_id] = {"rect": (x0, y0, bw, bh), "image_id": image_id}

    with open(os.path.join(data_dir, f"refs({splitBy}).p"), "wb") as f:
        pickle.dump(refs, f)
    with open(os.path.join(data_dir, "instances.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "catA"}, {"id": 2, "name": "catB"}]}, f)
    return root, expected
