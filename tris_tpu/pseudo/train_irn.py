"""IRNet affinity/displacement training (re-design of
`/root/reference/IRNet/step_refer/train_irn.py`).

One jitted step: frozen-trunk forward, affinity + displacement loss fields,
masked reductions, SGD update with per-step poly LR ((1 - t/T)^0.9) and the
displacement head at 10x LR (train_irn.py:33-36).

Reference quirk preserved: ``PolyOptimizer.__init__`` passes its
``weight_decay`` argument into SGD's *momentum* slot
(IRNet/misc/torchutils.py:9-11), so the reference effectively trains with
momentum=1e-4 and NO weight decay; we do the same.

After training, a calibration pass estimates the displacement running mean
over the train set (train_irn.py:94-107) which ``EdgeDisplacement`` subtracts
at inference.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.traverse_util import flatten_dict, unflatten_dict

from tris_tpu.pseudo.indexing import PathIndex
from tris_tpu.pseudo.irnet import IRNet, affinity_displacement_losses


@dataclasses.dataclass(frozen=True)
class IRNTrainConfig:
    crop_size: int = 512
    radius: int = 10
    lr: float = 0.1
    sgd_momentum: float = 1e-4  # the reference's misrouted weight_decay
    epochs: int = 3
    batch_size: int = 24
    poly_power: float = 0.9


class IRNTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: object
    batch_stats: object
    opt_state: object
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def _label_irn_params(params):
    flat = flatten_dict(params)
    labels = {}
    for path in flat:
        head = path[0]
        if head.startswith("fc_edge"):
            labels[path] = "edge"
        elif head.startswith("fc_dp") or head.startswith("dp"):
            labels[path] = "dp"
        else:
            labels[path] = "frozen"
    return unflatten_dict(labels)


def make_irn_optimizer(params, cfg: IRNTrainConfig, max_step: int):
    def sgd(scale):
        sched = lambda step: cfg.lr * scale * jnp.power(
            jnp.clip(1.0 - step / max_step, 0.0, 1.0), cfg.poly_power
        )
        return optax.sgd(learning_rate=sched, momentum=cfg.sgd_momentum)

    return optax.multi_transform(
        {"edge": sgd(1.0), "dp": sgd(10.0), "frozen": optax.set_to_zero()},
        _label_irn_params(params),
    )


def create_irn_state(model: IRNet, variables, cfg: IRNTrainConfig, max_step: int) -> IRNTrainState:
    tx = make_irn_optimizer(variables["params"], cfg, max_step)
    return IRNTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )


def affinity_labels_on_device(reduced_label: jnp.ndarray, path_index: PathIndex):
    """Quarter-scale ir label maps [B, h4, w4] (or [B, h4*w4]) int32 ->
    (bg_pos, fg_pos, neg) [B, n_dirs, n_pairs] float32 — the device twin of
    ``pseudo/aug.py::affinity_labels_from_indices`` (voc12/dataloader.py:
    83-109), two gathers per batch.

    Feeding the raw label map and building the pair masks INSIDE the jitted
    step is the TPU-shaped feed: the host-built masks are ~24 MB/example
    (3 x n_dirs x n_pairs f32) — ~0.5 GB/batch of H2D at the reference's
    bs 24, and most of the measured 3.6 s/batch host build cost — while the
    label map is 16 KB. Values are IDENTICAL (pinned by
    tests/test_pseudo.py::test_affinity_labels_on_device_match_host).
    """
    B = reduced_label.shape[0]
    H, W = path_index.size
    lab = reduced_label.reshape(B, H, W).astype(jnp.int32)
    # static slices, not gathers: src_indices is the window full[:ch, rf:rf+cw]
    # and dst_indices[d] the window shifted by search_dst[d] (see
    # PathIndex._path_indices) — the flat-gather formulation's jnp.take over
    # ~2M indices lowered to ~50 ms of serial while/dynamic-update-slice
    # chains per step (per-op profile, docs/PERF_NOTES.md round 5)
    rf = path_index.radius_floor
    ch, cw = H - rf, W - 2 * rf
    lab_from = lab[:, :ch, rf : rf + cw].reshape(B, 1, ch * cw)
    lab_to = jnp.stack(
        [lab[:, dy : dy + ch, rf + dx : rf + dx + cw]
         for dy, dx in path_index.search_dst], axis=1
    ).reshape(B, len(path_index.search_dst), ch * cw)
    valid = (lab_from < 21) & (lab_to < 21)
    equal = lab_from == lab_to
    pos = equal & valid
    return ((pos & (lab_from == 0)).astype(jnp.float32),
            (pos & (lab_from > 0)).astype(jnp.float32),
            ((~equal) & valid).astype(jnp.float32))


def irn_loss(params, batch_stats, model, path_index: PathIndex, batch):
    edge_out, dp_out = model.apply(
        {"params": params, "batch_stats": batch_stats}, batch["image"]
    )
    pos_aff, neg_aff, dp_fg, dp_bg = affinity_displacement_losses(edge_out, dp_out, path_index)

    if "reduced_label" in batch:
        bg_pos, fg_pos, neg = affinity_labels_on_device(batch["reduced_label"], path_index)
        bg_pos = bg_pos.reshape(pos_aff.shape)
        fg_pos = fg_pos.reshape(pos_aff.shape)
        neg = neg.reshape(neg_aff.shape)
    else:
        bg_pos = batch["aff_bg_pos"].reshape(pos_aff.shape)
        fg_pos = batch["aff_fg_pos"].reshape(pos_aff.shape)
        neg = batch["aff_neg"].reshape(neg_aff.shape)

    bg_pos_loss = (bg_pos * pos_aff).sum() / (bg_pos.sum() + 1e-5)
    fg_pos_loss = (fg_pos * pos_aff).sum() / (fg_pos.sum() + 1e-5)
    pos_loss = bg_pos_loss / 2 + fg_pos_loss / 2
    neg_loss = (neg * neg_aff).sum() / (neg.sum() + 1e-5)

    B = pos_aff.shape[0]
    fg4 = fg_pos.reshape(B, 1, *dp_fg.shape[2:])
    bg4 = bg_pos.reshape(B, 1, *dp_bg.shape[2:])
    dp_fg_loss = (dp_fg * fg4).sum() / (2 * fg_pos.sum() + 1e-5)
    dp_bg_loss = (dp_bg * bg4).sum() / (2 * bg_pos.sum() + 1e-5)

    total = (pos_loss + neg_loss) / 2 + (dp_fg_loss + dp_bg_loss) / 2
    metrics = {"loss": total, "pos_aff": pos_loss, "neg_aff": neg_loss,
               "dp_fg": dp_fg_loss, "dp_bg": dp_bg_loss}
    return total, metrics


def make_irn_train_step(model: IRNet, path_index: PathIndex, donate: bool = True):
    def step(state: IRNTrainState, batch):
        grad_fn = jax.value_and_grad(irn_loss, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, state.batch_stats, model, path_index, batch)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params, opt_state=new_opt), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def calibrate_mean_shift(model: IRNet, variables, batches: Iterable[dict]):
    """Estimate the displacement running mean over the train set
    (train_irn.py:94-107) and store it in batch_stats."""

    @jax.jit
    def batch_mean(variables, image):
        _, dp = model.apply(variables, image)
        return dp.mean(axis=(0, 1, 2))  # [2]

    means = [np.asarray(batch_mean(variables, b["image"])) for b in batches]
    mean = np.mean(np.stack(means), axis=0)
    new_stats = dict(variables.get("batch_stats", {}))
    new_stats["mean_shift"] = jnp.asarray(mean)
    return {**variables, "batch_stats": new_stats}
