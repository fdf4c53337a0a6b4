"""ReferIt (flicker-pickle) dataset + evaluator tests on a synthetic fixture."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from tests.helpers import TINY_RESNET_CLIP
from tris_tpu.data import mask_ops
from tris_tpu.data.referit import ReferItTestDataset, ReferItTrainDataset
from tris_tpu.eval.validate_referit import validate_referit
from tris_tpu.models.stage1 import Stage1Config, TRISStage1


@pytest.fixture(scope="module")
def referit_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("referit")
    (root / "annotations").mkdir()
    (root / "images").mkdir()
    rng = np.random.default_rng(3)
    h, w = 60, 80
    ann = {}
    for image_id in (101, 102, 103):
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / "images" / f"{image_id}.jpg")
        refs = []
        for k in range(2):
            x0, y0, bw, bh = 10 + 20 * k, 8 + 10 * k, 30, 25  # >5% area
            mask = np.zeros((h, w), np.uint8)
            mask[y0 : y0 + bh, x0 : x0 + bw] = 1
            rle = mask_ops.rle_encode(mask)
            refs.append({
                "image_id": image_id,
                "query": f"region {k} of picture {image_id}",
                "bbox": [[x0, y0, x0 + bw, y0 + bh]],
                "segmentation": rle,
            })
        # one tiny box that must be skipped at eval (area < 5%)
        tiny = np.zeros((h, w), np.uint8)
        tiny[0:3, 0:3] = 1
        refs.append({
            "image_id": image_id,
            "query": "tiny thing",
            "bbox": [[0, 0, 3, 3]],
            "segmentation": mask_ops.rle_encode(tiny),
        })
        ann[str(image_id)] = {"annotations": refs}
    for split in ("train", "test"):
        with open(root / "annotations" / f"{split}.pickle", "wb") as f:
            pickle.dump(ann, f)
    return str(root)


def test_train_dataset(referit_root):
    ds = ReferItTrainDataset(referit_root, size=64, max_tokens=20, negative_samples=2)
    assert len(ds) == 9  # 3 images x 3 refs
    ex = ds.train_example(0, np.random.default_rng(0))
    assert ex["image"].shape == (64, 64, 3)
    assert ex["word_ids"].shape == (20,)
    assert ex["word_ids"][0] == 49406
    assert ex["neg_word_ids"].shape == (2, 20)


def test_test_dataset_skips_tiny_boxes(referit_root):
    ds = ReferItTestDataset(referit_root, size=64, max_tokens=20)
    assert len(ds) == 3
    ex = ds.example(0)
    assert len(ex["refs"]) == 2  # tiny box filtered out (5% area rule)
    assert ex["orig_size"] == (60, 80)
    for ref in ex["refs"]:
        assert ref["mask"].shape == (60, 80)
        assert ref["mask"].sum() == 30 * 25


def test_validate_referit_e2e(referit_root):
    ds = ReferItTestDataset(referit_root, size=64, max_tokens=20)
    model = TRISStage1(Stage1Config(hidden_dim=32, clip_override=TINY_RESNET_CLIP))
    img = jnp.zeros((1, 64, 64, 3))
    ids = jnp.ones((1, 20), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, ids, train=False)
    res = validate_referit(model, variables, ds)
    for k in ("mIoU", "oIoU", "hit", "prec@0.5", "prec@0.9"):
        assert k in res
        assert 0.0 <= res[k] <= 100.0
