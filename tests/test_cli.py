"""End-to-end CLI tests on the synthetic dataset with tiny backbones."""

import json
import os

import numpy as np
import pytest

import tris_tpu.models.clip as clip_mod
from tests.fixtures import make_fake_refcoco
from tests.helpers import TINY_RESNET_CLIP, TINY_VIT_CLIP
from tris_tpu.config import get_parser


@pytest.fixture()
def tiny_backbones(monkeypatch):
    import dataclasses

    monkeypatch.setitem(clip_mod.CLIP_CONFIGS, "RN50", TINY_RESNET_CLIP)
    monkeypatch.setitem(clip_mod.CLIP_CONFIGS, "ViT-B-32",
                        dataclasses.replace(TINY_VIT_CLIP))
    yield


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root, expected = make_fake_refcoco(str(tmp_path_factory.mktemp("refdata")))
    return root, expected


def _args(extra):
    return get_parser().parse_args(extra)


def test_train_stage1_e2e(fake_root, tiny_backbones, tmp_path):
    from tris_tpu.cli import train_stage1

    root, _ = fake_root
    out = str(tmp_path / "out")
    args = _args([
        "--dataset", "refcoco", "--splitBy", "unc", "--refer_data_root", root,
        "--batch_size", "2", "--size", "64", "--epoch", "1",
        "--negative_samples", "2", "--test_split", "val", "--output", out,
        "--print-freq", "1", "--eval_batch", "2", "--hidden_dim", "32",
    ])
    train_stage1.main(args)
    ckpts = [f for f in os.listdir(out) if f.endswith(".msgpack")]
    assert any("best" in c for c in ckpts)


def test_validate_prms_cli(fake_root, tiny_backbones, tmp_path):
    from tris_tpu.cli import validate as validate_cli

    root, _ = fake_root
    cam_dir = str(tmp_path / "cam")
    name_dir = str(tmp_path / "names")
    args = _args([
        "--dataset", "refcoco", "--splitBy", "unc", "--refer_data_root", root,
        "--size", "64", "--test_split", "train", "--prms", "--save_cam",
        "--cam_save_dir", cam_dir, "--name_save_dir", name_dir,
        "--eval_batch", "2", "--hidden_dim", "32",
    ])
    validate_cli.main(args)
    names = json.load(open(os.path.join(name_dir, "refcoco_train_names.json")))
    assert len(names) == 6
    for n in names:
        assert os.path.exists(os.path.join(cam_dir, f"{n}.npy"))


def test_irnet_pipeline_e2e(fake_root, tiny_backbones, tmp_path):
    """cam_to_ir_label -> train_irn -> make_ins_seg on the fake data."""
    from tris_tpu.pseudo.pipeline import (
        PseudoConfig, run_cam_to_ir_label, run_make_ins_seg, run_train_irn,
    )

    root, _ = fake_root
    rng = np.random.default_rng(0)
    cam_dir = tmp_path / "cam"
    cam_dir.mkdir()
    # fake PRMS outputs: one cam per train image at ORIGINAL size (48x64)
    names = []
    for idx, img_id in enumerate([1, 1, 2, 2, 3, 3]):
        name = f"{idx}_{img_id}"
        cam = np.zeros((48, 64), np.float32)
        cam[10:30, 10:40] = rng.random((20, 30)).astype(np.float32) * 0.5 + 0.5
        np.save(cam_dir / f"{name}.npy", cam)
        names.append(name)
    names_file = tmp_path / "names.json"
    names_file.write_text(json.dumps(names))

    cfg = PseudoConfig(
        train_list=str(names_file),
        data_root=os.path.join(root, "train2014"),
        cam_dir=str(cam_dir),
        ir_label_dir=str(tmp_path / "ir_label"),
        ins_seg_dir=str(tmp_path / "ins_seg"),
        irn_weights=str(tmp_path / "irn.msgpack"),
        crop_size=64,
        radius=5,
        exp_times=3,
        num_workers=2,
    )
    run_cam_to_ir_label(cfg, parallel=False)
    from PIL import Image

    lab = np.asarray(Image.open(tmp_path / "ir_label" / f"{names[0]}.png"))
    assert lab.shape == (48, 64)
    assert set(np.unique(lab)) <= {0, 1, 255}

    variables = run_train_irn(cfg, epochs=1, batch_size=2, lr=0.01, log=lambda *a: None)
    assert os.path.exists(cfg.irn_weights)

    # default pass: sharded over every local device (8 on the CPU mesh) with
    # the host/device pipeline inside each worker
    run_make_ins_seg(cfg, variables=variables, log=lambda *a: None)
    det = np.load(tmp_path / "ins_seg" / f"{names[0]}.npy", allow_pickle=True).item()
    assert set(det.keys()) == {"score", "mask", "class", "cam"}
    assert det["mask"].ndim == 3 and det["mask"].shape[1:] == (48, 64)

    # sharded+pipelined outputs must be IDENTICAL to a serial single-device
    # pass (depth=0 fetches each stage immediately): the fan-out only
    # overlaps work, it must not change any npy
    import dataclasses as _dc

    import jax

    cfg_serial = _dc.replace(cfg, ins_seg_dir=str(tmp_path / "ins_seg_serial"))
    run_make_ins_seg(cfg_serial, variables=variables, log=lambda *a: None,
                     devices=[jax.devices()[0]], depth=0)
    for n in names:
        a = np.load(tmp_path / "ins_seg" / f"{n}.npy", allow_pickle=True).item()
        b = np.load(tmp_path / "ins_seg_serial" / f"{n}.npy", allow_pickle=True).item()
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{n}:{k}")

    # stage-2 consumes these: verify the dataset can load them
    from tris_tpu.data.dataset import ReferSegDataset

    ds = ReferSegDataset(root, split="train", size=64, pseudo_path=str(tmp_path / "ins_seg"))
    ex = ds.train_example(0, np.random.default_rng(0))
    assert ex["pseudo"].shape == (64, 64, 1)

    # ---- continue the reference's four-command recipe at the CLI surface:
    # ins_seg -> train_stage2 main (1 epoch, EMA teacher on) -> best ckpt ->
    # cli/validate --stage 2 on it (train_stage2.py:37-90, validate.py:23-24)
    from tris_tpu.cli import train_stage2 as train_stage2_cli
    from tris_tpu.cli import validate as validate_cli

    out2 = str(tmp_path / "out_stage2")
    args2 = _args([
        "--dataset", "refcoco", "--splitBy", "unc", "--refer_data_root", root,
        "--pseudo_path", str(tmp_path / "ins_seg"),
        "--batch_size", "2", "--size", "64", "--epoch", "1",
        "--test_split", "val", "--output", out2, "--print-freq", "1",
        "--eval_batch", "2", "--model_ema", "--consistency_type", "mse",
    ])
    train_stage2_cli.main(args2)
    best = [f for f in os.listdir(out2) if "best" in f and f.endswith(".msgpack")]
    assert best, os.listdir(out2)

    val_args = _args([
        "--dataset", "refcoco", "--splitBy", "unc", "--refer_data_root", root,
        "--size", "64", "--test_split", "val", "--eval_batch", "2",
        "--stage", "2", "--pretrain", os.path.join(out2, best[0]), "--eval",
    ])
    results = validate_cli.main(val_args)
    assert 0.0 <= results["val"]["mIoU"] <= 100.0


def test_demo_cli(fake_root, tiny_backbones, tmp_path, monkeypatch):
    from tris_tpu.cli import demo

    root, _ = fake_root
    img_path = os.path.join(root, "train2014", "COCO_train2014_000000000001.jpg")
    monkeypatch.chdir(tmp_path)
    args = _args(["--img", img_path, "--text", "the thing", "--hidden_dim", "32"])
    cam = demo.main(args)
    assert cam.shape == (48, 64)
    assert os.path.exists(tmp_path / "figs" / "demo_(the thing).png")


def test_train_stage1_tp_e2e(fake_root, tiny_backbones, tmp_path):
    """--tp 2 on the 8-virtual-device mesh: the tensor-parallel train loop
    runs end-to-end and writes a best checkpoint (parallel/tp.py wiring)."""
    import jax

    if jax.device_count() < 4:
        pytest.skip("needs a multi-device mesh")
    from tris_tpu.cli import train_stage1

    root, _ = fake_root
    out = str(tmp_path / "out_tp")
    args = _args([
        "--dataset", "refcoco", "--splitBy", "unc", "--refer_data_root", root,
        "--batch_size", "4", "--size", "64", "--epoch", "1",
        "--negative_samples", "2", "--test_split", "val", "--output", out,
        "--print-freq", "1", "--eval_batch", "2", "--hidden_dim", "32",
        "--tp", "2",
    ])
    train_stage1.main(args)
    ckpts = [f for f in os.listdir(out) if f.endswith(".msgpack")]
    assert any("best" in c for c in ckpts)
