"""Logger + scalar metrics writer.

Re-design of `/root/reference/logger.py` (rank-0 stdout logger) and the
tensorboardX scalar stream (`train_stage1.py:376-385`): scalars go to a JSONL
file (always) and to TensorBoard via ``tf.summary`` when TensorFlow is
importable.
"""

from __future__ import annotations

import functools
import json
import logging
import os
import sys
import time
from typing import Optional


@functools.lru_cache()
def create_logger(dist_rank: int = 0, name: str = "tris") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if dist_rank == 0 and not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setLevel(logging.DEBUG)
        handler.setFormatter(logging.Formatter(
            "[%(asctime)s %(name)s] (%(filename)s %(lineno)d): %(levelname)s %(message)s",
            datefmt="%Y-%m-%d %H:%M:%S",
        ))
        logger.addHandler(handler)
    return logger


class MetricsWriter:
    """Scalar writer: JSONL always; TensorBoard if available."""

    def __init__(self, log_dir: Optional[str]):
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            try:
                import tensorflow as tf  # noqa: PLC0415

                self._tb = tf.summary.create_file_writer(log_dir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int):
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": int(step), "ts": time.time()}
            ) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                tf.summary.scalar(tag, float(value), step=int(step))

    def scalars(self, values: dict, step: int, prefix: str = ""):
        for k, v in values.items():
            self.scalar(prefix + k, v, step)

    def flush(self):
        if self._jsonl is not None:
            self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
