"""Shared flax building blocks with exact PyTorch numerical semantics.

Everything here mirrors a torch op the reference depends on
(`/root/reference/CLIP/clip/model.py`) so that converted pre-trained weights
reproduce activations to float tolerance, while staying idiomatic JAX: static
shapes, einsum attention, no data-dependent control flow.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tris_tpu.ops.resize import bilinear_resize


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's QuickGELU: ``x * sigmoid(1.702 x)`` (CLIP/clip/model.py:361-363)."""
    return x * jax.nn.sigmoid(1.702 * x)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_head: int,
    attn_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scaled dot-product MHA on already-projected [N, L, C] tensors.

    Matches ``torch.nn.functional.multi_head_attention_forward`` semantics:
    the query is scaled by ``head_dim ** -0.5`` and ``attn_mask`` is additive.
    """
    N, Lq, C = q.shape
    Lk = k.shape[1]
    hd = C // n_head
    qh = q.reshape(N, Lq, n_head, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(N, Lk, n_head, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(N, Lk, n_head, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("nhqd,nhkd->nhqk", qh * (hd ** -0.5), kh)
    if attn_mask is not None:
        logits = logits + attn_mask
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("nhqk,nhkd->nhqd", weights, vh)
    return out.transpose(0, 2, 1, 3).reshape(N, Lq, C)


class TorchMultiheadAttention(nn.Module):
    """Self-attention with ``torch.nn.MultiheadAttention``'s fused qkv params.

    Parameter layout (flax kernels are [in, out]):
      in_proj/kernel  [C, 3C], in_proj/bias [3C]
      out_proj/kernel [C, C],  out_proj/bias [C]
    """

    d_model: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        C = self.d_model
        in_kernel = self.param("in_proj_kernel", nn.initializers.xavier_uniform(), (C, 3 * C), self.dtype)
        in_bias = self.param("in_proj_bias", nn.initializers.zeros_init(), (3 * C,), self.dtype)
        qkv = x @ in_kernel + in_bias
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = multi_head_attention(q, k, v, self.n_head, attn_mask)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


class LayerNormFp32(nn.Module):
    """LayerNorm computed in float32 regardless of input dtype (model.py:352-358)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")(x.astype(jnp.float32))
        return y.astype(orig_dtype)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block with QuickGELU MLP (model.py:366-386)."""

    d_model: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = LayerNormFp32(self.d_model, self.dtype, name="ln_1")(x)
        x = x + TorchMultiheadAttention(self.d_model, self.n_head, self.dtype, name="attn")(h, attn_mask)
        h = LayerNormFp32(self.d_model, self.dtype, name="ln_2")(x)
        h = nn.Dense(self.d_model * 4, dtype=self.dtype, name="mlp_c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="mlp_c_proj")(h)
        return x + h


class AttentionPool2d(nn.Module):
    """CLIP's attention pooling, modified for variable input size.

    As in the reference's surgical change (model.py:70-104): the spatial part
    of the positional embedding is bilinearly resized to the actual (H, W), a
    mean token is prepended, and full self-attention runs over HW+1 tokens.

    Layout is NHWC (TPU-native). Returns
    ``(global_feat [N, out], feature_map [N, H, W, out])``.
    """

    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        N, H, W, C = x.shape
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=self.embed_dim ** -0.5),
            (self.spacial_dim ** 2 + 1, self.embed_dim),
            self.dtype,
        )
        tokens = x.reshape(N, H * W, C)
        tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens], axis=1)

        cls_pos = pos[:1]
        spatial = pos[1:].reshape(1, self.spacial_dim, self.spacial_dim, self.embed_dim)
        spatial = spatial.transpose(0, 3, 1, 2)  # [1, C, S, S]
        spatial = bilinear_resize(spatial, (H, W), align_corners=False)
        spatial = spatial.reshape(self.embed_dim, H * W).T
        tokens = tokens + jnp.concatenate([cls_pos, spatial], axis=0)[None].astype(tokens.dtype)

        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(tokens)
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(tokens)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(tokens)
        out = multi_head_attention(q, k, v, self.num_heads)
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(out)  # [N, HW+1, out]

        global_feat = out[:, 0]
        feature_map = out[:, 1:].reshape(N, H, W, self.output_dim)
        return global_feat, feature_map


class InstanceNorm2d(nn.Module):
    """Affine instance norm over NHWC, matching torch's eps/affine defaults
    as used by the cross-modal attention modules (model/attn.py:32-33,75)."""

    features: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones_init(), (self.features,), self.dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), self.dtype)
        return y * scale + bias


class PReLU(nn.Module):
    """Channel-shared PReLU (torch default: one learnable slope, init 0.25)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.constant(0.25), (1,), self.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with torch-exact semantics and a folded eval path.

    Differences from ``flax.linen.BatchNorm`` that matter here:
    - eval: ``(mean, var, scale, bias)`` fold into ONE per-channel affine
      ``x * a + b`` computed in the input dtype — flax instead converts the
      whole activation to f32 and back per BN, which at bf16 lengthens every
      conv epilogue fusion (measured in the stage-1 forward HLO).
    - train: the running-var update uses the UNBIASED batch variance, as
      torch does (torch.nn.BatchNorm2d docs); flax stores the biased one.
      Normalization itself uses the biased variance on both sides.
    - torch defaults: eps 1e-5, momentum 0.1 (new = 0.9*old + 0.1*batch).

    Variable naming matches flax BatchNorm (params scale/bias, batch_stats
    mean/var) so converted checkpoints are interchangeable. Batch statistics
    are computed in f32 over the global (sharded) batch: under a data-sharded
    jit the reductions are cross-replica, i.e. SyncBatchNorm
    (train_stage1.py:69).
    """

    epsilon: float = 1e-5
    momentum: float = 0.1  # torch convention
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True) -> jnp.ndarray:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((C,), jnp.float32))

        if use_running_average:
            inv = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)   # [C] f32, folds at compile
            a = inv.astype(x.dtype)
            b = (bias - ra_mean.value * inv).astype(x.dtype)
            return x * a + b

        xf = x.astype(jnp.float32)
        n = x.shape[0] * x.shape[1] * x.shape[2]
        mean = xf.mean(axis=(0, 1, 2))
        var = xf.var(axis=(0, 1, 2))                                    # biased, used to normalize
        if not self.is_initializing():
            var_unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            ra_mean.value = (1 - m) * ra_mean.value + m * mean
            ra_var.value = (1 - m) * ra_var.value + m * var_unbiased
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(x.dtype)


def avg_pool_nhwc(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """``nn.AvgPool2d(window)`` on NHWC (kernel = stride = window, no padding)."""
    return nn.avg_pool(x, (window, window), strides=(window, window))


def causal_mask(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive upper-triangular -inf mask (model.py:537-543)."""
    mask = jnp.full((length, length), -jnp.inf, dtype=dtype)
    return jnp.triu(mask, k=1)
