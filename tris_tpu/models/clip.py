"""Modified CLIP backbone (flax, NHWC, static shapes).

Re-implementation of the reference's surgically-modified OpenAI CLIP
(`/root/reference/CLIP/clip/model.py`):

- ``AttentionPool2d`` resizes its positional embedding to the actual feature
  size and returns both the pooled embedding and the per-pixel feature map
  (model.py:70-104).
- ``ModifiedResNet`` returns the full feature pyramid
  ``(c1, c2, c3, c4, (global, local))`` (model.py:254-279).
- ``encode_text`` returns the full token sequence after ``ln_final`` plus the
  EOT embedding projected by ``text_projection`` (model.py:552-564), with the
  causal mask built at ``txt_length`` instead of 77 (model.py:537-543).

TPU-first: NHWC convs, fused attention einsums, everything jit-compatible with
static shapes. BatchNorm under a data-sharded ``jit`` computes global-batch
statistics (GSPMD inserts the cross-replica reductions), which is the TPU
equivalent of the reference's SyncBatchNorm (train_stage1.py:69).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tris_tpu.models.layers import (
    AttentionPool2d,
    LayerNormFp32,
    ResidualAttentionBlock,
    TorchBatchNorm,
    avg_pool_nhwc,
    causal_mask,
)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int
    image_resolution: int
    vision_layers: Union[Tuple[int, int, int, int], int]
    vision_width: int
    vision_patch_size: Optional[int]
    transformer_width: int
    transformer_heads: int
    transformer_layers: int
    context_length: int = 77
    txt_length: int = 20
    vocab_size: int = 49408

    @property
    def is_vit(self) -> bool:
        return isinstance(self.vision_layers, int)

    @property
    def vision_heads(self) -> int:
        if self.is_vit:
            return self.vision_width // 64
        return self.vision_width * 32 // 64


CLIP_CONFIGS = {
    "RN50": CLIPConfig(
        embed_dim=1024, image_resolution=224, vision_layers=(3, 4, 6, 3), vision_width=64,
        vision_patch_size=None, transformer_width=512, transformer_heads=8, transformer_layers=12,
    ),
    "RN101": CLIPConfig(
        embed_dim=512, image_resolution=224, vision_layers=(3, 4, 23, 3), vision_width=64,
        vision_patch_size=None, transformer_width=512, transformer_heads=8, transformer_layers=12,
    ),
    "ViT-B-32": CLIPConfig(
        embed_dim=512, image_resolution=224, vision_layers=12, vision_width=768,
        vision_patch_size=32, transformer_width=512, transformer_heads=8, transformer_layers=12,
    ),
    "ViT-B-16": CLIPConfig(
        embed_dim=512, image_resolution=224, vision_layers=12, vision_width=768,
        vision_patch_size=16, transformer_width=512, transformer_heads=8, transformer_layers=12,
    ),
}


def _conv(features: int, kernel: int, stride: int = 1, name: str = None, dtype=jnp.float32) -> nn.Conv:
    pad = (kernel - 1) // 2
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=((pad, pad), (pad, pad)), use_bias=False, dtype=dtype, name=name,
    )


def _bn(train: bool, name: str, dtype=jnp.float32):
    # torch defaults: eps 1e-5, momentum 0.1; eval path is a folded bf16
    # affine instead of flax's f32 round-trip (see TorchBatchNorm)
    bn = TorchBatchNorm(dtype=dtype, name=name)
    return lambda x: bn(x, use_running_average=not train)


class Bottleneck(nn.Module):
    """CLIP's anti-aliased ResNet bottleneck: stride lives in an avgpool after
    conv2, and the downsample path is avgpool -> 1x1 conv (model.py:10-55)."""

    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out_ch = self.planes * self.expansion
        identity = x

        h = nn.relu(_bn(train, "bn1", self.dtype)(_conv(self.planes, 1, name="conv1", dtype=self.dtype)(x)))
        h = nn.relu(_bn(train, "bn2", self.dtype)(_conv(self.planes, 3, name="conv2", dtype=self.dtype)(h)))
        if self.stride > 1:
            h = avg_pool_nhwc(h, self.stride)
        h = _bn(train, "bn3", self.dtype)(_conv(out_ch, 1, name="conv3", dtype=self.dtype)(h))

        if self.stride > 1 or x.shape[-1] != out_ch:
            identity = x
            if self.stride > 1:
                identity = avg_pool_nhwc(identity, self.stride)
            identity = _conv(out_ch, 1, name="ds_conv", dtype=self.dtype)(identity)
            identity = _bn(train, "ds_bn", self.dtype)(identity)

        return nn.relu(h + identity)


class ModifiedResNet(nn.Module):
    """CLIP ResNet trunk returning the full pyramid (model.py:194-279)."""

    layers: Tuple[int, int, int, int]
    output_dim: int
    heads: int
    input_resolution: int = 224
    width: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        w, dt = self.width, self.dtype
        # 3-layer stem (stride-2 conv then 2x avgpool => stride 4)
        x = nn.relu(_bn(train, "bn1", dt)(_conv(w // 2, 3, 2, "conv1", dt)(x)))
        x = nn.relu(_bn(train, "bn2", dt)(_conv(w // 2, 3, 1, "conv2", dt)(x)))
        x = nn.relu(_bn(train, "bn3", dt)(_conv(w, 3, 1, "conv3", dt)(x)))
        x = avg_pool_nhwc(x, 2)

        outs = []
        plan = [(w, self.layers[0], 1), (w * 2, self.layers[1], 2), (w * 4, self.layers[2], 2), (w * 8, self.layers[3], 2)]
        for stage, (planes, blocks, stride) in enumerate(plan, start=1):
            for i in range(blocks):
                x = Bottleneck(
                    planes, stride if i == 0 else 1, dtype=dt, name=f"layer{stage}_{i}"
                )(x, train=train)
            outs.append(x)

        pooled, fmap = AttentionPool2d(
            spacial_dim=self.input_resolution // 32,
            embed_dim=w * 32,
            num_heads=self.heads,
            output_dim=self.output_dim,
            dtype=dt,
            name="attnpool",
        )(x)
        outs.append((pooled, fmap))
        return tuple(outs)


class PatchEmbed(nn.Module):
    """ViT patch embedding as an explicit space-to-depth + matmul.

    Numerically the stride==patch_size VALID conv (kernel kept in the conv
    layout [ps, ps, in, width] for checkpoint compatibility), but expressed as
    ``[N*grid^2, ps*ps*3] @ [ps*ps*3, width]`` so BOTH directions run as dense
    matmuls. As a conv, the 3-input-channel forward fills 3/128 MXU lanes and
    — much worse — its input gradient is a transposed conv with 3 OUTPUT
    channels. The bwd matters because stage-1's l1 loss backprops THROUGH the
    frozen critic into the response map (train_stage1.py:327-340): the full
    stage-1 train step measures 480 img/s/chip with the conv form vs
    602 img/s/chip with this form on v5e (B=48, 320px; isolated microbenches
    of the op are relay-noise-dominated — the A/B is at the whole-step level,
    docs/PERF_NOTES.md round 3)."""

    patch_size: int
    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ps = self.patch_size
        N, H, W, C = x.shape
        # param stays f32 (nn.Conv semantics: fp32 params, compute in dtype);
        # cast at use so bf16 runs with f32-loaded checkpoints still hit the
        # bf16 matmul this module exists for.
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (ps, ps, C, self.width),
        ).astype(self.dtype)
        p = x.astype(self.dtype).reshape(N, H // ps, ps, W // ps, ps, C)
        p = p.transpose(0, 1, 3, 2, 4, 5).reshape(N, (H // ps) * (W // ps), ps * ps * C)
        return p @ kernel.reshape(ps * ps * C, self.width)


class VisionTransformer(nn.Module):
    """Plain CLIP ViT returning the projected CLS embedding (model.py:400-448).
    Used as the frozen critic (ViT-B/32) for the stage-1 losses and PRMS."""

    input_resolution: int
    patch_size: int
    width: int
    layers: int
    heads: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        N = x.shape[0]
        dt = self.dtype
        x = PatchEmbed(self.patch_size, self.width, dtype=dt, name="conv1")(x)
        # [N, grid**2, width]

        cls = self.param("class_embedding", nn.initializers.normal(self.width ** -0.5), (self.width,), dt)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.width ** -0.5),
            ((self.input_resolution // self.patch_size) ** 2 + 1, self.width),
            dt,
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (N, 1, self.width)), x], axis=1)
        x = x + pos[None]
        x = LayerNormFp32(self.width, dt, name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, dt, name=f"block_{i}")(x)
        x = LayerNormFp32(self.width, dt, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(self.width ** -0.5), (self.width, self.output_dim), dt)
        return x @ proj


class CLIP(nn.Module):
    """Full CLIP with the reference's modified outputs.

    ``encode_image`` -> ResNet: ``(c1, c2, c3, c4, (global, local))`` NHWC;
    ViT: global embedding ``[N, embed_dim]``.
    ``encode_text`` -> ``(seq [N, L, width], eot_embed [N, embed_dim])``.
    """

    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        if cfg.is_vit:
            self.visual = VisionTransformer(
                input_resolution=cfg.image_resolution,
                patch_size=cfg.vision_patch_size,
                width=cfg.vision_width,
                layers=cfg.vision_layers,
                heads=cfg.vision_heads,
                output_dim=cfg.embed_dim,
                dtype=self.dtype,
            )
        else:
            self.visual = ModifiedResNet(
                layers=tuple(cfg.vision_layers),
                output_dim=cfg.embed_dim,
                heads=cfg.vision_heads,
                input_resolution=cfg.image_resolution,
                width=cfg.vision_width,
                dtype=self.dtype,
            )
        self.blocks = [
            ResidualAttentionBlock(cfg.transformer_width, cfg.transformer_heads, self.dtype, name=f"block_{i}")
            for i in range(cfg.transformer_layers)
        ]
        self.token_embedding = nn.Embed(cfg.vocab_size, cfg.transformer_width, dtype=self.dtype)
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.transformer_width), self.dtype,
        )
        self.ln_final = LayerNormFp32(cfg.transformer_width, self.dtype)
        self.text_projection = self.param(
            "text_projection", nn.initializers.normal(cfg.transformer_width ** -0.5),
            (cfg.transformer_width, cfg.embed_dim), self.dtype,
        )
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(float(np.log(1 / 0.07))), (), jnp.float32,
        )

    def encode_image(self, image: jnp.ndarray, train: bool = False):
        """image: NHWC float."""
        if self.config.is_vit:
            return self.visual(image)
        return self.visual(image, train=train)

    def encode_text(self, text_ids: jnp.ndarray):
        """text_ids: [N, L] int32, L <= context_length (typically txt_length)."""
        L = text_ids.shape[1]
        x = self.token_embedding(text_ids) + self.positional_embedding[None, :L]
        mask = causal_mask(L, dtype=jnp.float32)
        for block in self.blocks:
            x = block(x, attn_mask=mask)
        x = self.ln_final(x)
        # EOT token = highest id in each row (model.py:562)
        eot_idx = jnp.argmax(text_ids, axis=-1)
        eot = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
        hidden = eot @ self.text_projection
        return x, hidden

    def __call__(self, image: jnp.ndarray, text_ids: jnp.ndarray, train: bool = False):
        """Contrastive logits, as the reference CLIP.forward (model.py:566-580)."""
        img_out = self.encode_image(image, train=train)
        img_feat = img_out if self.config.is_vit else img_out[4][0]
        txt_feat = self.encode_text(text_ids)[1]
        img_feat = img_feat / jnp.linalg.norm(img_feat, axis=-1, keepdims=True)
        txt_feat = txt_feat / jnp.linalg.norm(txt_feat, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img_feat @ txt_feat.T
        return logits_per_image, logits_per_image.T
