"""Stage-1 training step: text-supervised contrastive objective.

One jit-compiled XLA program per step, re-designing the reference's hot loop
(`/root/reference/train_stage1.py:301-372`):

- ``l1``: CLIP-critic foreground loss — the sigmoid response map modulates the
  224px image and a frozen ViT-B/32 scores it against the expression
  (train_stage1.py:327-340, 263-284).
- ``l4``: batch-contrastive classification, ``multilabel_soft_margin(cls, I)``
  (train_stage1.py:354).
- ``l5``: CBS negative-expression loss. The reference loops over the batch in
  Python (train_stage1.py:345-353); here all ``B*S`` negatives are encoded in
  one batched text forward and scored with one einsum.

The critic parameters are passed as inputs (not closed-over constants) and
receive no gradient; gradients still flow through its activations into the
response map, as in the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from tris_tpu import losses
from tris_tpu.ops.resize import bilinear_resize
from tris_tpu.train.state import TrainState

CLIP_INPUT_SIZE = 224  # ViT-B/32 critic resolution (train_stage1.py:298)


@dataclasses.dataclass(frozen=True)
class Stage1LossWeights:
    w1: float = 1.0
    w4: float = 5.0
    w5: float = 2.0


def _resize_nhwc(x_nhwc: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear resize NHWC with align_corners=True (train_stage1.py:328-329)."""
    y = x_nhwc.transpose(0, 3, 1, 2)
    y = bilinear_resize(y, (size, size), align_corners=True)
    return y.transpose(0, 2, 3, 1)


def stage1_loss(
    params,
    batch_stats,
    model,
    critic,
    critic_vars,
    batch: dict,
    weights: Stage1LossWeights,
):
    """Returns (loss, (new_batch_stats, metrics))."""
    from tris_tpu.ops.normalize import image_input_to_f32

    image = image_input_to_f32(batch["image"])  # u8 feed (TRIS_U8_FEED)
    word_ids = batch["word_ids"]
    B = image.shape[0]

    (cls_out, cls_fg, relu_map, sig_map, scale), mut = model.apply(
        {"params": params, "batch_stats": batch_stats},
        image, word_ids, train=True, mutable=["batch_stats"],
    )

    critic_size = critic.config.image_resolution
    cam224 = _resize_nhwc(sig_map, critic_size)
    img224 = _resize_nhwc(image, critic_size)
    fg224 = cam224 * img224

    img_feat = critic.apply(critic_vars, fg224, method="encode_image")
    neg_ids = batch.get("neg_word_ids")

    # one fused text-tower pass for the positive expressions AND the CBS
    # negatives: every op in encode_text is row-independent, so the fused
    # [B*(1+S), L] batch is numerically identical to separate calls while
    # filling the MXU better (the reference encodes them separately, and the
    # negatives one sample at a time — train_stage1.py:340,345-353)
    if neg_ids is not None:
        S, L = neg_ids.shape[1], neg_ids.shape[2]
        all_ids = jnp.concatenate([word_ids, neg_ids.reshape(B * S, L)], axis=0)
        _, all_txt = critic.apply(critic_vars, all_ids, method="encode_text")
        txt_feat, neg_txt = all_txt[:B], all_txt[B:]
        l5 = losses.cbs_loss(img_feat, neg_txt.reshape(B, S, -1))
    else:
        _, txt_feat = critic.apply(critic_vars, word_ids, method="encode_text")
        l5 = jnp.zeros((), img_feat.dtype)
    l1 = losses.max_loss(losses.clip_similarity(img_feat, txt_feat))

    l4 = losses.multilabel_soft_margin_loss(cls_out, jnp.eye(B, dtype=cls_out.dtype))

    loss = weights.w1 * l1 + weights.w4 * l4 + weights.w5 * l5
    metrics = {"loss": loss, "l1": l1, "l4": l4, "l5": l5, "cls_fg": cls_fg.mean()}
    return loss, (mut["batch_stats"], metrics)


def make_train_step(model, critic, weights: Stage1LossWeights = Stage1LossWeights(), donate: bool = True,
                    chain: int = 1):
    """Build the jitted stage-1 train step: (state, batch, critic_vars) -> (state, metrics).

    ``chain > 1`` runs that many optimizer steps inside one XLA program: the
    batch's leaves must carry a leading ``chain`` axis (``[chain, B, ...]``)
    and a ``lax.scan`` consumes one slice per step (metrics are the last
    step's). Scanning over per-step xs means NOTHING is loop-invariant — the
    text towers etc. re-run every step exactly as the per-dispatch path does.
    Used by bench.py to amortize per-dispatch host overhead — on a
    directly-attached TPU host one dispatch costs microseconds and chain=1 is
    equivalent, but through a relayed runtime dispatch can exceed the ~79 ms
    device step time and a chained program measures the chip, not the link.
    """

    def train_step(state: TrainState, batch: dict, critic_vars) -> tuple:
        grad_fn = jax.value_and_grad(stage1_loss, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, model, critic, critic_vars, batch, weights
        )
        state = state.apply_gradients(grads, new_stats)
        return state, metrics

    if chain > 1:
        def chained(state: TrainState, batches: dict, critic_vars) -> tuple:
            def body(s, b):
                return train_step(s, b, critic_vars)

            state, ms = jax.lax.scan(body, state, batches, length=chain)
            return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

        return jax.jit(chained, donate_argnums=(0,) if donate else ())

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
