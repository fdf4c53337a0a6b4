import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax

from tests.fixtures import make_fake_refcoco
from tests.helpers import TINY_RESNET_CLIP, TINY_VIT_CLIP
from tris_tpu.data.dataset import Loader, ReferSegDataset
from tris_tpu.eval import metrics
from tris_tpu.eval.validate import normalize_threshold, resize_to_original_np, validate, validate_prms
from tris_tpu.models.clip import CLIP
from tris_tpu.models.stage1 import Stage1Config, TRISStage1


def test_compute_mask_iu():
    t = np.zeros((4, 4), np.uint8)
    p = np.zeros((4, 4), bool)
    t[:2, :2] = 1
    p[1:3, :2] = True
    I, U = metrics.compute_mask_iu(t, p)
    assert (I, U) == (2, 6)


def test_is_correct_hit():
    heat = np.zeros((10, 10), np.float32)
    heat[3, 7] = 1.0
    gt_mask = np.zeros((10, 10), np.uint8)
    gt_mask[3, 7] = 1
    hit, loc, hitm = metrics.is_correct_hit(np.array([[6, 2, 8, 4]]), heat, gt_mask)
    assert hit == 1 and loc == (3, 7) and hitm == 1
    hit, _, hitm = metrics.is_correct_hit(np.array([[0, 0, 2, 2]]), heat, np.zeros((10, 10)))
    assert hit == 0 and hitm == 0


def test_box_iou_and_nms():
    b1 = np.array([[0, 0, 10, 10]])
    b2 = np.array([[5, 5, 15, 15], [0, 0, 10, 10]])
    iou = metrics.box_iou(b1, b2)
    assert np.isclose(iou[0, 1], 1.0)
    assert np.isclose(iou[0, 0], 25 / 175)
    keep = metrics.nms(
        np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]]),
        np.array([0.9, 0.8, 0.7]),
        0.3,
    )
    assert 0 in keep and 2 in keep and 1 not in keep


def test_generate_bbox_finds_blob():
    cam = np.zeros((64, 64), np.float64)
    cam[10:30, 20:40] = 1.0
    boxes = metrics.generate_bbox(cam)
    assert len(boxes) >= 1
    x1, y1, x2, y2, conf = boxes[0]
    assert x1 <= 22 and y1 <= 12 and x2 >= 38 and y2 >= 28


def test_resize_to_original_matches_torch(rng):
    cam = rng.random((20, 20)).astype(np.float32)
    got = resize_to_original_np(cam, 37, 53)
    want = TF.interpolate(
        torch.from_numpy(cam)[None, None], (37, 53), mode="bilinear", align_corners=True
    )[0, 0].numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_accumulator_weighted_prms_semantics():
    acc = metrics.SegEvalAccumulator(with_boxes=False)
    t = np.zeros((8, 8), np.uint8)
    t[:4] = 1
    p = t.astype(bool)
    cam = t.astype(np.float32)
    acc.add(t, p, cam, np.array([0, 0, 8, 4]), weight=3)
    r = acc.results()
    assert np.isclose(r["mIoU"], 100.0)
    assert np.isclose(r["oIoU"], 100.0)
    assert np.isclose(r["hit"], 100.0)
    assert acc.n == 3


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    root, _ = make_fake_refcoco(str(tmp_path_factory.mktemp("refdata")))
    ds = ReferSegDataset(root, split="val", size=64, eval_mode=True)
    loader = Loader(ds, batch_size=2, shuffle=False, drop_last=False, num_threads=1)
    model = TRISStage1(Stage1Config(hidden_dim=32, clip_override=TINY_RESNET_CLIP))
    import jax.numpy as jnp

    img = jnp.zeros((1, 64, 64, 3))
    ids = jnp.ones((1, 20), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, ids, train=False)
    return model, variables, loader


def test_validate_end_to_end(eval_setup):
    model, variables, loader = eval_setup
    res = validate(model, variables, loader, with_boxes=True)
    for k in ("mIoU", "oIoU", "hit", "hitm", "box_mIoU", "box_acc", "prec@0.5"):
        assert k in res
        assert 0.0 <= res[k] <= 100.0


def test_validate_prms_end_to_end(eval_setup, tmp_path):
    model, variables, loader = eval_setup
    critic = CLIP(TINY_VIT_CLIP)
    import jax.numpy as jnp

    critic_vars = critic.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), jnp.ones((1, 20), jnp.int32)
    )
    cam_dir = str(tmp_path / "cam")
    name_dir = str(tmp_path / "names")
    res = validate_prms(
        model, critic, variables, critic_vars, loader,
        save_cam=True, cam_save_dir=cam_dir, name_save_dir=name_dir, dataset_name="refcoco",
    )
    assert 0.0 <= res["mIoU"] <= 100.0
    import json, os

    names = json.load(open(os.path.join(name_dir, "refcoco_train_names.json")))
    assert len(names) == 2  # two val refs
    for n in names:
        cam = np.load(os.path.join(cam_dir, f"{n}.npy"))
        assert cam.shape == (48, 64)  # original image size
        assert cam.max() <= 1.0 + 1e-5
