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


def test_device_resize_norm_matches_host():
    import jax.numpy as jnp

    from tris_tpu.eval.validate import (
        _device_resize_norm, _padded_resize_matrix, normalize_threshold,
    )

    rng = np.random.default_rng(0)
    h = w = 20
    sizes = [(37, 53), (48, 64)]
    maxh, maxw = 48, 64
    # include negative values: stage-2 logits may be negative, and the
    # device max must still match the host max over the valid region
    cams = rng.standard_normal((2, 3, h, w)).astype(np.float32)
    Ah = jnp.asarray(np.stack([_padded_resize_matrix(h, s[0], maxh) for s in sizes]))
    Aw = jnp.asarray(np.stack([_padded_resize_matrix(w, s[1], maxw) for s in sizes]))
    got = np.asarray(_device_resize_norm(jnp.asarray(cams), Ah, Aw))
    for b, (oh, ow) in enumerate(sizes):
        for j in range(3):
            want, _ = normalize_threshold(resize_to_original_np(cams[b, j], oh, ow))
            np.testing.assert_allclose(got[b, j, :oh, :ow], want, atol=1e-5, rtol=1e-5)
            # padded region must be exactly zero pre-normalization
            assert np.all(got[b, j, oh:, :] * 0 == 0)


def test_validate_device_resize_matches_host_path(eval_setup):
    # with_boxes=True keeps metrics on host, exercising the device-resize
    # (but not scalars-only) path: cams come back normalized at padded size
    model, variables, loader = eval_setup
    res_host = validate(model, variables, loader, with_boxes=True, device_resize=False)
    res_dev = validate(model, variables, loader, with_boxes=True, device_resize=True)
    for k in res_host:
        np.testing.assert_allclose(res_dev[k], res_host[k], atol=1e-4)


def test_validate_prms_device_resize_matches_host_path(eval_setup, tmp_path):
    from tris_tpu.models.clip import CLIP as _CLIP

    model, variables, loader = eval_setup
    critic = _CLIP(TINY_VIT_CLIP)
    import jax.numpy as jnp

    critic_vars = critic.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), jnp.ones((1, 20), jnp.int32)
    )
    host_dir, dev_dir = str(tmp_path / "h"), str(tmp_path / "d")
    res_host = validate_prms(model, critic, variables, critic_vars, loader,
                             save_cam=True, cam_save_dir=host_dir, device_resize=False)
    res_dev = validate_prms(model, critic, variables, critic_vars, loader,
                            save_cam=True, cam_save_dir=dev_dir, device_resize=True)
    for k in res_host:
        np.testing.assert_allclose(res_dev[k], res_host[k], atol=1e-4)
    import os

    for f in os.listdir(host_dir):
        a, b = np.load(os.path.join(host_dir, f)), np.load(os.path.join(dev_dir, f))
        assert a.shape == b.shape
        np.testing.assert_allclose(b, a, atol=1e-5)


def test_device_metrics_match_host_chain():
    import jax.numpy as jnp

    from tris_tpu.eval.validate import (
        _device_metrics, _padded_resize_matrix, normalize_threshold,
    )

    rng = np.random.default_rng(5)
    h = w = 16
    sizes = [(30, 44), (48, 64)]
    maxh, maxw = 48, 64
    # negative-valued maps (stage-2 logits), an all-zero map (tie case), and
    # ordinary relu maps all in one batch
    cams = rng.standard_normal((2, 3, h, w)).astype(np.float32)
    cams[0, 0] = np.abs(cams[0, 0])
    cams[1, 1] = 0.0
    targets = np.zeros((2, maxh, maxw), np.uint8)
    gt = [rng.random(s) > 0.6 for s in sizes]
    for b, s in enumerate(sizes):
        targets[b, : s[0], : s[1]] = gt[b]
    bboxes = np.array([[5, 3, 30, 20], [0, 0, 10, 10]], np.float32)
    Ah = jnp.asarray(np.stack([_padded_resize_matrix(h, s[0], maxh) for s in sizes]))
    Aw = jnp.asarray(np.stack([_padded_resize_matrix(w, s[1], maxw) for s in sizes]))
    I, U, hit, hitm = (
        np.asarray(x)
        for x in _device_metrics(jnp.asarray(cams), Ah, Aw, jnp.asarray(targets), jnp.asarray(bboxes))
    )
    for b, (oh, ow) in enumerate(sizes):
        for j in range(3):
            cam_norm, pred = normalize_threshold(resize_to_original_np(cams[b, j], oh, ow))
            wi, wu = metrics.compute_mask_iu(gt[b].astype(np.uint8), pred)
            whit, _, whitm = metrics.is_correct_hit(
                bboxes[b][None], cam_norm, gt[b].astype(np.uint8)
            )
            assert (I[b, j], U[b, j]) == (wi, wu), (b, j)
            assert (hit[b, j], hitm[b, j]) == (whit, whitm), (b, j)


def test_validate_device_metrics_matches_host_path(eval_setup):
    model, variables, loader = eval_setup
    # save_cam=False + with_boxes=False activates the scalars-only device path
    res_dev = validate(model, variables, loader, with_boxes=False, device_resize=True)
    res_host = validate(model, variables, loader, with_boxes=False, device_resize=False)
    for k in res_host:
        np.testing.assert_allclose(res_dev[k], res_host[k], atol=1e-4)


def test_validate_on_mesh_matches_single_device(eval_setup):
    from tris_tpu.parallel.mesh import create_mesh

    model, variables, loader = eval_setup
    mesh = create_mesh(jax.devices()[:2])  # eval_batch=2 shards 1 ref/chip
    res_mesh = validate(model, variables, loader, with_boxes=False, mesh=mesh)
    res_one = validate(model, variables, loader, with_boxes=False)
    for k in res_one:
        np.testing.assert_allclose(res_mesh[k], res_one[k], atol=1e-4)


def test_validate_prms_on_mesh_matches_single_device(eval_setup, tmp_path):
    from tris_tpu.parallel.mesh import create_mesh

    model, variables, loader = eval_setup
    critic = CLIP(TINY_VIT_CLIP)
    import jax.numpy as jnp

    critic_vars = critic.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), jnp.ones((1, 20), jnp.int32)
    )
    mesh = create_mesh(jax.devices()[:2])
    d1, d2 = str(tmp_path / "one"), str(tmp_path / "mesh")
    res_one = validate_prms(model, critic, variables, critic_vars, loader,
                            save_cam=True, cam_save_dir=d1)
    res_mesh = validate_prms(model, critic, variables, critic_vars, loader,
                             save_cam=True, cam_save_dir=d2, mesh=mesh)
    for k in res_one:
        np.testing.assert_allclose(res_mesh[k], res_one[k], atol=1e-4)
    import os

    for f in os.listdir(d1):
        np.testing.assert_allclose(
            np.load(os.path.join(d2, f)), np.load(os.path.join(d1, f)), atol=1e-5
        )
