"""Stage-2 training step: pseudo-supervised BCE + optional EMA consistency.

Re-design of `/root/reference/train_stage2.py:271-374`: BCE of all four side
outputs against the IRNet pseudo-mask, plus an optional mean-teacher
consistency term (sigmoid-MSE or Bernoulli-KL) against an EMA copy of the
parameters (train_stage2.py:57-64,258-269,302-319). All in one jitted step;
the EMA update is fused into the same program.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tris_tpu import losses
from tris_tpu.train.state import TrainState, ema_update


@dataclasses.dataclass(frozen=True)
class Stage2TrainConfig:
    use_ema: bool = False
    consistency: str = "mse"  # 'mse' | 'kl'
    ema_decay: float = 0.9999
    ema_update_every: int = 10
    ema_update_after: int = 100


def stage2_loss(params, batch_stats, ema_params, ema_batch_stats, model, batch,
                cfg: Stage2TrainConfig):
    from tris_tpu.ops.normalize import image_input_to_f32

    image = image_input_to_f32(batch["image"])  # u8 feed (TRIS_U8_FEED)
    word_ids = batch["word_ids"]
    pseudo = batch["pseudo"]  # [B, H, W, 1] float/int

    outs, mut = model.apply(
        {"params": params, "batch_stats": batch_stats},
        image, word_ids, train=True, mutable=["batch_stats"],
    )
    o1, o2, o3, o4 = outs
    l1 = losses.bce_with_logits(o1, pseudo)
    l2 = losses.bce_with_logits(o2, pseudo)
    l3 = losses.bce_with_logits(o3, pseudo)
    l4 = losses.bce_with_logits(o4, pseudo)

    if cfg.use_ema and ema_params is not None:
        # Teacher forward in train-head mode (4 side outputs), no gradient —
        # the reference's EMA copy stays in train mode (nn.Module default at
        # EMA(model) time, train_stage2.py:258-260), so its BN normalizes by
        # the *batch* stats; the teacher's own running buffers (ema_pytorch
        # EMAs buffers) are carried for --ema_eval.
        ema_outs = model.apply(
            {
                "params": jax.lax.stop_gradient(ema_params),
                "batch_stats": jax.lax.stop_gradient(ema_batch_stats),
            },
            image, word_ids, train=True, mutable=["batch_stats"],
        )[0]
        cons = losses.sigmoid_mse_consistency if cfg.consistency == "mse" else losses.sigmoid_kl_consistency
        l5 = sum(cons(s, jax.lax.stop_gradient(t)) for s, t in zip(outs, ema_outs))
    else:
        l5 = jnp.zeros((), o1.dtype)

    loss = l1 + l2 + l3 + l4 + l5
    metrics = {"loss": loss, "l1": l1, "l2": l2, "l3": l3, "l4": l4, "l5": l5}
    return loss, (mut["batch_stats"], metrics)


def make_train_step(model, cfg: Stage2TrainConfig = Stage2TrainConfig(), donate: bool = True,
                    chain: int = 1):
    """Build the jitted stage-2 train step: (state, batch) -> (state, metrics).

    ``chain > 1`` runs that many optimizer steps inside one XLA program; the
    batch's leaves must carry a leading ``chain`` axis (``[chain, B, ...]``)
    and a ``lax.scan`` consumes one slice per step (metrics are the last
    step's) — same de-hoisted relay-amortizing bench option as the stage-1
    step (train/stage1.py::make_train_step). The EMA counter/decay schedule
    sees the same per-step ``state.step`` increments either way.
    """

    def train_step(state: TrainState, batch: dict):
        grad_fn = jax.value_and_grad(stage2_loss, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, state.ema_params, state.ema_batch_stats,
            model, batch, cfg,
        )
        state = state.apply_gradients(grads, new_stats)
        if cfg.use_ema and state.ema_params is not None:
            # ema_pytorch semantics (the reference's EMA(model) defaults,
            # train_stage2.py:258-260,328-332): update() runs once per batch
            # with a 0-based counter; on counter % update_every == 0 the
            # teacher is COPIED from the student while counter <= update_after
            # and EMA'd afterwards with decay 1-(1+epoch)^(-2/3) capped at
            # beta, epoch = counter - update_after - 1. Float buffers (BN
            # stats) follow the same rule.
            counter = state.step - 1  # apply_gradients already incremented
            epoch = jnp.maximum(counter - cfg.ema_update_after - 1, 0).astype(jnp.float32)
            decay = jnp.where(
                epoch <= 0.0,
                0.0,  # copy phase: teacher := student
                jnp.minimum(cfg.ema_decay, 1.0 - jnp.power(1.0 + epoch, -2.0 / 3.0)),
            )
            do_update = (counter % cfg.ema_update_every) == 0

            # lax.cond (not jnp.where): on the (update_every-1)/update_every
            # steps where ema_pytorch's counter gate skips the update, the
            # false branch forwards the teacher trees untouched instead of
            # streaming both ~430 MB f32 trees through HBM for a no-op select
            # (measured round 5 in docs/PERF_NOTES.md).
            new_ema_params, new_ema_stats = jax.lax.cond(
                do_update,
                lambda trees: (ema_update(trees[0], state.params, decay),
                               ema_update(trees[1], state.batch_stats, decay)),
                lambda trees: trees,
                (state.ema_params, state.ema_batch_stats),
            )
            state = state.replace(
                ema_params=new_ema_params, ema_batch_stats=new_ema_stats,
            )
        return state, metrics

    if chain > 1:
        def chained(state: TrainState, batches: dict):
            state, ms = jax.lax.scan(train_step, state, batches, length=chain)
            return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

        return jax.jit(chained, donate_argnums=(0,) if donate else ())

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
