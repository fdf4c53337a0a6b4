"""Checkpoint save/load.

Two layers:
- :func:`save_variables` / :func:`load_variables`: single-file msgpack of a
  flax variables dict (used for IRNet weights and converted CLIP params).
- :class:`CheckpointManager`: training checkpoints {params, batch_stats,
  opt_state, step, [ema]} with the reference's best-checkpoint policy —
  keep best-by-mIoU and best-by-hit, deleting the previous best
  (`/root/reference/train_stage1.py:192-217`, `utils/util.py:50-107`).
"""

from __future__ import annotations

import atexit
import os
import shutil
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _write_msgpack(path: str, host_tree: dict) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(host_tree))
    os.replace(tmp, path)  # atomic: a crash mid-write never corrupts the ckpt
    return path


def save_variables(path: str, variables: dict) -> str:
    return _write_msgpack(path, _to_numpy_tree(variables))


def load_variables(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _train_checkpoint_payload(state, extra: Optional[dict] = None) -> dict:
    """Fetch a TrainState to host numpy (must happen synchronously: the train
    step donates the state's buffers, so device arrays can't be read later)."""
    payload = {
        "step": np.asarray(state.step),
        "params": _to_numpy_tree(state.params),
        "batch_stats": _to_numpy_tree(state.batch_stats),
        # optax states are namedtuple pytrees; convert to plain dicts first
        "opt_state": serialization.to_state_dict(_to_numpy_tree(state.opt_state)),
    }
    if getattr(state, "ema_params", None) is not None:
        payload["ema_params"] = _to_numpy_tree(state.ema_params)
    if getattr(state, "ema_batch_stats", None) is not None:
        payload["ema_batch_stats"] = _to_numpy_tree(state.ema_batch_stats)
    if extra:
        payload["extra"] = {k: np.asarray(v) for k, v in extra.items()}
    return payload


def save_train_checkpoint(path: str, state, extra: Optional[dict] = None) -> str:
    """Serialize a TrainState (+ extras like epoch) to one msgpack file."""
    return _write_msgpack(path, _train_checkpoint_payload(state, extra))


class AsyncCheckpointWriter:
    """Overlaps checkpoint serialization + disk IO with training.

    The device->host fetch stays on the caller (donation safety); the msgpack
    encode and file write — the multi-second part at 150M params — run on a
    single background thread, preserving submission order (so delete-previous
    -best then write-new-best sequences stay correct). ``wait()`` flushes;
    also flushed at interpreter exit.
    """

    def __init__(self):
        self._executor = ThreadPoolExecutor(max_workers=1, thread_name_prefix="ckpt")
        self._lock = threading.Lock()
        self._futures = []
        atexit.register(self.wait)

    def submit(self, fn, *args):
        with self._lock:
            self._futures = [f for f in self._futures if not f.done()]
            fut = self._executor.submit(fn, *args)
            self._futures.append(fut)
        return fut

    def save_train_checkpoint(self, path: str, state, extra: Optional[dict] = None):
        payload = _train_checkpoint_payload(state, extra)  # sync fetch
        return self.submit(_write_msgpack, path, payload)

    def remove(self, path: str):
        return self.submit(lambda p: os.path.exists(p) and os.remove(p), path)

    def wait(self):
        with self._lock:
            futures, self._futures = self._futures, []
        for f in futures:
            f.result()  # re-raises writer errors on the main thread


def load_train_checkpoint(path: str, state):
    """Restore a TrainState from :func:`save_train_checkpoint` output.

    Returns (state, extra_dict). Optimizer state is restored with
    ``serialization.from_state_dict`` so pytree structure is preserved.
    """
    payload = load_variables(path)
    new_state = state.replace(
        step=payload["step"],
        params=serialization.from_state_dict(state.params, payload["params"]),
        batch_stats=serialization.from_state_dict(state.batch_stats, payload["batch_stats"]),
        opt_state=serialization.from_state_dict(state.opt_state, payload["opt_state"]),
    )
    if "ema_params" in payload and getattr(state, "ema_params", None) is not None:
        new_state = new_state.replace(
            ema_params=serialization.from_state_dict(state.ema_params, payload["ema_params"])
        )
    if "ema_batch_stats" in payload and getattr(state, "ema_batch_stats", None) is not None:
        new_state = new_state.replace(
            ema_batch_stats=serialization.from_state_dict(
                state.ema_batch_stats, payload["ema_batch_stats"]
            )
        )
    return new_state, payload.get("extra", {})


def load_params_only(path: str, params):
    """Model-only restore, tolerant like load_pretrained_checkpoint
    (utils/util.py:98-107)."""
    payload = load_variables(path)
    src = payload.get("params", payload)
    return serialization.from_state_dict(params, src)


def resume_train_state(path: str, state):
    """Full resume: restores params/batch_stats/opt_state/step when `path` is a
    training checkpoint (reference load_checkpoint, utils/util.py:81-96);
    falls back to params-only for plain variable files.

    Returns (state, start_epoch_or_None).
    """
    payload = load_variables(path)
    if "opt_state" in payload:
        new_state, extra = load_train_checkpoint(path, state)
        epoch = extra.get("epoch")
        return new_state, (int(epoch) + 1 if epoch is not None else None)
    state = state.replace(
        params=serialization.from_state_dict(state.params, payload.get("params", payload))
    )
    if "batch_stats" in payload:
        state = state.replace(
            batch_stats=serialization.from_state_dict(state.batch_stats, payload["batch_stats"])
        )
    return state, None


class BestCheckpointKeeper:
    """Best-by-metric checkpoint bookkeeping (train_stage1.py:172-217).

    Saves run asynchronously (delete-previous-best + write-new-best are
    ordered on the writer thread) so the train loop doesn't stall for the
    multi-second msgpack write; call :meth:`wait` before reading a written
    checkpoint back (e.g. the final reload-best-and-validate pass).
    """

    def __init__(self, output_dir: str, async_writer: Optional[AsyncCheckpointWriter] = None):
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.writer = async_writer if async_writer is not None else AsyncCheckpointWriter()
        self.best = {
            "val_acc": -1.0, "val_hit": -1.0, "epoch": -1, "path": "",
            "hit": -1.0, "hit_path": "",
        }

    def update(self, epoch: int, miou: float, hit: float, state, extra=None) -> dict:
        if miou > self.best["val_acc"]:
            if self.best["path"]:
                self.writer.remove(self.best["path"])
            path = os.path.join(self.output_dir, f"ckpt_320_epoch_{epoch}_best.msgpack")
            self.writer.save_train_checkpoint(path, state, extra)
            self.best.update(val_acc=miou, val_hit=hit, epoch=epoch, path=path)
        if hit > self.best["hit"]:
            if self.best["hit_path"]:
                self.writer.remove(self.best["hit_path"])
            path = os.path.join(self.output_dir, f"ckpt_320_epoch_{epoch}_hit.msgpack")
            self.writer.save_train_checkpoint(path, state, extra)
            self.best.update(hit=hit, hit_path=path)
        return dict(self.best)

    def wait(self):
        self.writer.wait()
