"""ReferIt (RefCLEF-style flicker pickle) datasets.

Re-design of `/root/reference/dataset/Dataset_referit.py`:

- train: pickle ``annotations/train.pickle`` flattened to one entry per ref
  (Dataset_referit.py:52-103); one CLIP-tokenized query per sample, plus
  optional negatives.
- test: dict-of-expressions per image with RLE-decoded gt masks; boxes whose
  area is under 5% of the image are skipped (Dataset_referit.py:106-152).

Images are normalized with ImageNet stats at ``size x size`` (the flicker
transform, Dataset_referit.py:31-47). Layout NHWC.
"""

from __future__ import annotations

import os
import pickle
from typing import Iterator, List, Optional

import numpy as np

from tris_tpu.data import mask_ops
from tris_tpu.data.transforms import image_to_array, load_image, load_transformed
from tris_tpu.tokenizer import tokenize


def _tokenize_query(query: str, max_tokens: int) -> np.ndarray:
    return tokenize(query, context_length=77, truncate=True)[0, :max_tokens].astype(np.int32)


def load_referit_gt_mask(mask_path: str) -> np.ndarray:
    """SAIAPR TC-12 .mat ground-truth mask (Dataset_referit.py:21-24)."""
    from scipy import io as sio

    mat = sio.loadmat(mask_path)
    return mat["segimg_t"] == 0


def save_tmp_mask(input_path: str, save_name: str) -> None:
    """Dump a .mat gt mask as a PNG (Dataset_referit.py:26-28)."""
    import cv2

    cv2.imwrite(save_name, load_referit_gt_mask(input_path).astype(np.uint8) * 255)


class ReferItTrainDataset:
    def __init__(self, root: str, split: str = "train", size: int = 320,
                 max_tokens: int = 20, negative_samples: int = 0):
        with open(os.path.join(root, "annotations", split + ".pickle"), "rb") as f:
            self.annotations = pickle.load(f, encoding="latin1")
        self.img_folder = os.path.join(root, "images")
        self.size = size
        self.max_tokens = max_tokens
        self.negative_samples = negative_samples

        self.refs: List[dict] = []
        for key in self.annotations:
            for ref in self.annotations[str(key)]["annotations"]:
                self.refs.append(ref)

    def __len__(self) -> int:
        return len(self.refs)

    def train_example(self, index: int, rng: np.random.Generator) -> dict:
        ref = self.refs[index]
        out = {
            "image": load_transformed(
                os.path.join(self.img_folder, f"{ref['image_id']}.jpg"), self.size),
            "word_ids": _tokenize_query(ref["query"], self.max_tokens),
        }
        if self.negative_samples > 0:
            negs = []
            while len(negs) < self.negative_samples:
                other = self.refs[int(rng.integers(len(self.refs)))]
                if other["query"] != ref["query"]:
                    negs.append(_tokenize_query(other["query"], self.max_tokens))
            out["neg_word_ids"] = np.stack(negs)
        return out


class ReferItTestDataset:
    """Per-image iteration: all expressions with decoded masks (>5% area)."""

    def __init__(self, root: str, split: str = "test", size: int = 320, max_tokens: int = 20):
        with open(os.path.join(root, "annotations", split + ".pickle"), "rb") as f:
            self.annotations = pickle.load(f, encoding="latin1")
        self.files = list(self.annotations.keys())
        self.img_folder = os.path.join(root, "images")
        self.size = size
        self.max_tokens = max_tokens

    def __len__(self) -> int:
        return len(self.files)

    def example(self, index: int) -> dict:
        item = str(self.files[index])
        img = load_image(os.path.join(self.img_folder, item + ".jpg"))
        oh, ow = img.height, img.width
        anns = self.annotations[item]["annotations"]
        refs = []
        for ann in anns:
            bbox = np.asarray(ann["bbox"])
            b = bbox[0] if bbox.ndim == 2 else bbox
            if (b[3] - b[1]) * (b[2] - b[0]) <= 0.05 * oh * ow:
                continue  # skip tiny boxes (Dataset_referit.py:136)
            mask = mask_ops.rle_decode(ann["segmentation"])
            if mask.ndim == 3:
                mask = mask.sum(axis=2)
            refs.append({
                "sentences": ann["query"],
                "word_ids": _tokenize_query(ann["query"], self.max_tokens),
                "bbox": np.asarray(bbox),
                "mask": mask.astype(np.uint8),
            })
        return {
            "image": image_to_array(img, self.size),
            "refs": refs,
            "orig_size": (oh, ow),
            "img_path": os.path.join(self.img_folder, item + ".jpg"),
        }

    def iter_examples(self) -> Iterator[dict]:
        for i in range(len(self)):
            yield self.example(i)
