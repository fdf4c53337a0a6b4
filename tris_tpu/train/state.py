"""Train state, optimizer factory, and LR schedules.

Mirrors the reference's optimization recipe:
- AdamW, base lr 5e-5, weight decay 0.01, backbone at ``lr * 0.1``
  (`/root/reference/train_stage1.py:133-144`).
- Per-*iteration* polynomial decay ``(1 - step/total)**0.9``
  (train_stage1.py:143-144,371-372).
- Stage-1 quirk preserved: ``logit_scale`` is in neither param group in the
  reference (model_stage1.py:44-52 collects only backbone + new heads), so it
  never receives updates; we freeze it the same way.
- Stage-2: backbone group excludes ``positional_embedding`` params
  (model_stage2.py:93-103).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.traverse_util import flatten_dict, unflatten_dict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_params: Any = None  # optional EMA teacher (stage 2)
    ema_batch_stats: Any = None  # teacher's own BN buffers (ema_pytorch EMAs buffers too)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def poly_schedule(base_lr: float, total_steps: int, power: float = 0.9) -> optax.Schedule:
    """LambdaLR ``(1 - step/total)**power`` stepped per iteration."""

    def schedule(step):
        frac = jnp.clip(step / total_steps, 0.0, 1.0)
        return base_lr * jnp.power(1.0 - frac, power)

    return schedule


def poly_epoch_schedule(
    base_lr: float, end_lr: float, power: float, max_decay_steps: int, steps_per_epoch: int
) -> optax.Schedule:
    """The reference's ``PolynomialLRDecay`` (utils/poly_lr_decay.py:3-39):
    epoch-level decay ``(base-end)*(1-epoch/max)^power + end``, frozen at
    ``end_lr`` after ``max_decay_steps`` epochs. Used by the reference's
    stage-2 non-CLIP (swin) branch (train_stage2.py:137-140) with the
    ``--end_lr/--power/--max_decay_steps`` flags; scheduler.step() runs once
    per epoch (train_stage2.py:192), i.e. epoch = step // steps_per_epoch,
    starting from epoch 1 after the first step()."""

    def schedule(step):
        # torch steps the scheduler *after* each epoch, so epoch k trains at
        # last_step=k (first epoch at the base lr is epoch 0 -> last_step 0
        # only before any step(); get_lr at construction returns base_lr).
        epoch = jnp.minimum(step // steps_per_epoch, max_decay_steps)
        frac = 1.0 - epoch / max_decay_steps
        return (base_lr - end_lr) * jnp.power(frac, power) + end_lr

    return schedule


def _label_params(params, stage: str):
    """Assign each param to 'backbone' / 'head' / 'frozen' per reference policy."""
    flat = flatten_dict(params)
    labels = {}
    for path in flat:
        joined = "/".join(str(p) for p in path)
        if stage == "stage1" and path[0] == "logit_scale":
            labels[path] = "frozen"
        elif path[0] == "backbone":
            if stage == "stage2" and "positional_embedding" in joined:
                labels[path] = "head"
            else:
                labels[path] = "backbone"
        else:
            labels[path] = "head"
    return unflatten_dict(labels)


def make_optimizer(
    params,
    base_lr: float = 5e-5,
    lr_multi: float = 0.1,
    weight_decay: float = 0.01,
    total_steps: int = 1,
    power: float = 0.9,
    stage: str = "stage1",
    schedule_factory: Optional[Callable[[float], optax.Schedule]] = None,
) -> optax.GradientTransformation:
    """``schedule_factory(group_base_lr) -> Schedule`` overrides the default
    per-step poly decay (used for the reference's PolynomialLRDecay branch)."""

    def adamw(lr_scale: float):
        if schedule_factory is not None:
            lr = schedule_factory(base_lr * lr_scale)
        else:
            lr = poly_schedule(base_lr * lr_scale, total_steps, power)
        return optax.adamw(
            learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay,
        )

    return optax.multi_transform(
        {
            "backbone": adamw(lr_multi),
            "head": adamw(1.0),
            "frozen": optax.set_to_zero(),
        },
        _label_params(params, stage),
    )


def create_train_state(
    model,
    variables: dict,
    total_steps: int,
    base_lr: float = 5e-5,
    lr_multi: float = 0.1,
    weight_decay: float = 0.01,
    stage: str = "stage1",
    with_ema: bool = False,
    schedule_factory: Optional[Callable[[float], optax.Schedule]] = None,
) -> TrainState:
    params = variables["params"]
    tx = make_optimizer(
        params, base_lr=base_lr, lr_multi=lr_multi, weight_decay=weight_decay,
        total_steps=total_steps, stage=stage, schedule_factory=schedule_factory,
    )
    stats = variables.get("batch_stats", {})
    # a REAL buffer copy: with device-array inputs an identity tree_map would
    # alias ema_params to params, and the donated train step would then pass
    # the same buffer twice — the TPU runtime rejects that (InvalidArgument)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=stats,
        opt_state=tx.init(params),
        tx=tx,
        ema_params=copy(params) if with_ema else None,
        ema_batch_stats=copy(stats) if with_ema else None,
    )


def ema_update(ema_params, params, decay: float = 0.9999):
    """EMA teacher update (reference uses ema_pytorch defaults, train_stage2.py:57-64).

    Each teacher leaf KEEPS its own dtype (the lerp runs in f32): a traced
    f32 ``decay`` would otherwise promote low-precision leaves and change the
    state pytree's types between steps — which the stage-2 step's
    ``lax.cond`` gate (both branches must match) and ``lax.scan`` chain mode
    (carry type stability) both reject, and which silently forced a second
    compile of the old ``jnp.where`` formulation.
    """
    return jax.tree_util.tree_map(
        lambda e, p: (e.astype(jnp.float32) * decay
                      + p.astype(jnp.float32) * (1.0 - decay)).astype(e.dtype),
        ema_params, params,
    )
