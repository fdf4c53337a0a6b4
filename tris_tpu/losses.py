"""Loss library — batched, jit-friendly re-implementations of the reference's
training objectives (`/root/reference/train_stage1.py:263-364`,
`train_stage2.py:301-319`, `model/model_stage1.py:122`).

The reference's CBS negative-expression loss loops over the batch in Python
(train_stage1.py:345-353); here it is a single einsum over [B, S] negatives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


def max_loss(similarity: jnp.ndarray) -> jnp.ndarray:
    """``-mean(log(clamp(sim, 1e-4, 0.9999)))`` (train_stage1.py:280-284)."""
    x = jnp.clip(similarity, 0.0001, 0.9999)
    return -jnp.mean(jnp.log(x))


def clip_similarity(image_features: jnp.ndarray, text_features: jnp.ndarray) -> jnp.ndarray:
    """Per-pair cosine similarity of matched rows: [N, C] x [N, C] -> [N]."""
    img = l2_normalize(image_features)
    txt = l2_normalize(text_features)
    return jnp.sum(img * txt, axis=-1)


def cbs_loss(image_features: jnp.ndarray, neg_text_features: jnp.ndarray) -> jnp.ndarray:
    """Contrastive batch-suppression loss on negative expressions.

    image_features: [B, C] (fg-modulated image embeddings, frozen critic)
    neg_text_features: [B, S, C] (S negative expressions per sample)

    = mean_b mean_s ( -log(1 - cos(img_b, neg_{b,s})) )   (train_stage1.py:342-353)
    """
    img = l2_normalize(image_features)
    txt = l2_normalize(neg_text_features)
    scores = jnp.einsum("bc,bsc->bs", img, txt)
    scores = jnp.clip(scores, -0.9999, 0.9999)
    return jnp.mean(-jnp.log(1.0 - scores))


def multilabel_soft_margin_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch ``F.multilabel_soft_margin_loss`` (mean over batch of class-mean).

    loss_bc = -[ y log sigmoid(x) + (1-y) log sigmoid(-x) ]
    """
    pos = jax.nn.log_sigmoid(logits)
    neg = jax.nn.log_sigmoid(-logits)
    per_class = -(targets * pos + (1.0 - targets) * neg)
    return per_class.mean(axis=-1).mean()


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch ``F.binary_cross_entropy_with_logits`` reduction='mean'
    (model/model_stage2.py:139-141)."""
    targets = targets.astype(logits.dtype)
    per_elem = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return per_elem.mean()


def sigmoid_mse_consistency(student_logits, teacher_logits) -> jnp.ndarray:
    """EMA consistency: MSE between sigmoids (train_stage2.py:258-269)."""
    return jnp.mean((jax.nn.sigmoid(student_logits) - jax.nn.sigmoid(teacher_logits)) ** 2)


def sigmoid_kl_consistency(student_logits, teacher_logits) -> jnp.ndarray:
    """KL between Bernoulli distributions given logits."""
    p = jax.nn.sigmoid(teacher_logits)
    log_q = jax.nn.log_sigmoid(student_logits)
    log_1mq = jax.nn.log_sigmoid(-student_logits)
    log_p = jax.nn.log_sigmoid(teacher_logits)
    log_1mp = jax.nn.log_sigmoid(-teacher_logits)
    return jnp.mean(p * (log_p - log_q) + (1 - p) * (log_1mp - log_1mq))
