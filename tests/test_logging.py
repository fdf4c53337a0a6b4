"""MetricsWriter: JSONL always, TensorBoard event files when a backend exists."""

import json
import os

import pytest

from tris_tpu.utils.logging import MetricsWriter, _make_tb_writer


def test_metrics_writer_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.scalars({"loss": 1.5, "l1": 0.25}, step=3, prefix="train/")
    w.scalar("test/mIoU", 42.0, step=1)
    w.close()
    lines = [json.loads(x) for x in open(tmp_path / "metrics.jsonl")]
    assert {(r["tag"], r["step"]) for r in lines} == {
        ("train/loss", 3), ("train/l1", 3), ("test/mIoU", 1)
    }
    assert lines[-1]["value"] == 42.0


def test_metrics_writer_tensorboard_events(tmp_path):
    """The reference streams scalars to tensorboardX (train_stage1.py:376-385);
    the rebuild writes the same event files when any TB backend is importable."""
    if _make_tb_writer(str(tmp_path / "probe")) is None:
        pytest.skip("no TensorBoard backend installed")
    w = MetricsWriter(str(tmp_path / "tb"))
    w.scalar("train/loss", 0.5, step=1)
    w.close()
    events = [f for f in os.listdir(tmp_path / "tb") if "tfevents" in f]
    assert events, os.listdir(tmp_path / "tb")


def test_metrics_writer_disabled_dir():
    w = MetricsWriter(None)  # no board_folder: all writes are no-ops
    w.scalar("x", 1.0, 0)
    w.flush()
    w.close()
