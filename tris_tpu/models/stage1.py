"""Stage-1 TRIS: text-supervised response-map network.

Re-design of `/root/reference/model/model_stage1.py` on the NHWC CLIP
backbone. The batch-contrastive core — every image's pixel embeddings scored
against *all* B text embeddings in the batch — is one einsum
(`model_stage1.py:75-78`), the classification head is GMP+GAP pooling with a
focal penalty (`model_stage1.py:80-108`), and the output response map is the
diagonal image<->own-text slice upsampled to input size
(`model_stage1.py:110-114`).

All shapes are static; train/eval variants are selected by a Python bool at
trace time, so each compiles to a single XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tris_tpu.models.clip import CLIP, CLIP_CONFIGS, CLIPConfig
from tris_tpu.models.fusion import BilateralPrompt
from tris_tpu.ops.resize import bilinear_resize


@dataclasses.dataclass(frozen=True)
class Stage1Config:
    backbone: str = "RN50"  # "RN50" | "RN101"
    hidden_dim: int = 1024
    txt_length: int = 20
    attn_multi: float = 0.1
    focal_p: float = 3.0
    focal_lambda: float = 0.01
    clip_override: Optional[CLIPConfig] = None  # for tests / custom backbones

    @property
    def clip_config(self) -> CLIPConfig:
        base = self.clip_override or CLIP_CONFIGS[self.backbone]
        return dataclasses.replace(base, txt_length=self.txt_length)

    @property
    def text_dim(self) -> int:
        # projected text embedding dim: 1024 for RN50, 512 for RN101
        return self.clip_config.embed_dim


def focal_penalty(x: jnp.ndarray, p: float, c: float) -> jnp.ndarray:
    """``(1 - x)^p * log(c + x)`` (model_stage1.py:122-123)."""
    return jnp.power(1.0 - x, p) * jnp.log(c + x)


class TRISStage1(nn.Module):
    config: Stage1Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.backbone = CLIP(cfg.clip_config, dtype=self.dtype)
        self.vis_project = nn.Dense(cfg.hidden_dim, dtype=self.dtype)
        self.lan_project = nn.Dense(cfg.hidden_dim, dtype=self.dtype)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(float(np.log(1 / 0.07))), (), jnp.float32
        )
        if cfg.attn_multi > 0:
            self.attn_fusion = BilateralPrompt(cfg.hidden_dim, cfg.hidden_dim, dtype=self.dtype)

    def __call__(self, image: jnp.ndarray, word_ids: jnp.ndarray, train: bool = False):
        """image: [B, H, W, 3]; word_ids: [B, L] int32.

        Returns (train): ``(cls_out [B,B], cls_fg [B], relu_map, sigmoid_map, logit_scale)``
        with maps as [B, H, W, 1]; (eval): ``relu_map`` only.
        """
        cfg = self.config
        B, H, W, _ = image.shape

        _, hidden = self.backbone.encode_text(word_ids)          # [B, text_dim]
        c1, c2, c3, c4, _ = self.backbone.encode_image(image, train=train)
        h_, w_ = c4.shape[1], c4.shape[2]

        lan = self.lan_project(hidden)                            # [B, D]
        vis = self.vis_project(c4)                                # [B, h, w, D]
        vis_t = vis.reshape(B, h_ * w_, cfg.hidden_dim)
        lan_all = jnp.broadcast_to(lan[None], (B, B, cfg.hidden_dim))

        norm_vis = vis_t / jnp.linalg.norm(vis_t, axis=-1, keepdims=True)
        norm_lan = lan_all / jnp.linalg.norm(lan_all, axis=-1, keepdims=True)

        if cfg.attn_multi > 0:
            new_vis, new_lan = self.attn_fusion(
                norm_vis.reshape(B, h_, w_, cfg.hidden_dim), norm_lan
            )
            # residual at fixed 0.1 (model_stage1.py:73-74)
            norm_vis = new_vis.reshape(B, h_ * w_, cfg.hidden_dim) * 0.1 + norm_vis
            norm_lan = new_lan * 0.1 + norm_lan

        scale = jnp.exp(self.logit_scale)
        # [B, HW, B]: pixel p of image b scored against text of image q
        score = scale * jnp.einsum("bpc,bqc->bpq", norm_vis, norm_lan)

        # diagonal response map: image b against its own text
        own = jnp.take_along_axis(
            score, jnp.arange(B)[:, None, None], axis=2
        )  # [B, HW, 1]
        seg = own.reshape(B, h_, w_, 1).transpose(0, 3, 1, 2)     # [B, 1, h, w]
        seg = bilinear_resize(seg, (H, W), align_corners=False)
        seg = seg.transpose(0, 2, 3, 1)                           # [B, H, W, 1]

        if not train:
            return nn.relu(seg)

        # classification head over (bg + B text) channels
        score_t = score.transpose(0, 2, 1)                        # [B, Btxt, HW]
        bg = jnp.ones_like(score_t[:, :1])
        feats = jnp.concatenate([bg, score_t], axis=1)            # [B, 1+B, HW]
        masks = jax.nn.softmax(feats, axis=1)

        cls_gap = feats.mean(axis=-1)
        cls_gmp = feats.max(axis=-1)
        cls_1 = cls_gap + cls_gmp
        cls_2 = focal_penalty(masks.mean(axis=-1), cfg.focal_p, cfg.focal_lambda)
        cls_out = (cls_1 + cls_2)[:, 1:]                          # [B, B]

        fg_masks = masks[:, 1:]                                   # [B, B, HW]
        labels = jnp.eye(B, dtype=masks.dtype)
        cls_fg = (fg_masks.mean(axis=-1) * labels).sum(axis=-1)   # [B]

        return cls_out, cls_fg, nn.relu(seg), jax.nn.sigmoid(seg), scale

    def response_maps(self, image: jnp.ndarray, word_ids: jnp.ndarray) -> jnp.ndarray:
        """Per-(image, sentence)-pair eval maps: [B, H, W, 3] x [B, S, L] -> [B, S, H, W].

        Matches the reference eval protocol exactly: `validate.py:173-179` runs
        the model at batch 1 per sentence, so the bilateral fusion and the
        score only ever see that pair's OWN text. Flattening (image, sentence)
        pairs into one batch through ``__call__`` would instead let the fusion
        attend over every text in the batch (model_stage1.py:66 repeats `lan`
        across the batch) — different maps whenever ``attn_multi > 0``.

        Also the perf-shaped path: the vision trunk (~85% of a forward) runs
        ONCE per image and is reused across its S sentences, instead of the
        S-fold recompute a flattened batch pays.
        """
        cfg = self.config
        B, S, L = word_ids.shape
        H, W = image.shape[1], image.shape[2]

        _, hidden = self.backbone.encode_text(word_ids.reshape(B * S, L))
        _, _, _, c4, _ = self.backbone.encode_image(image, train=False)
        h_, w_ = c4.shape[1], c4.shape[2]

        lan = self.lan_project(hidden)                            # [B*S, D]
        vis = self.vis_project(c4)                                # [B, h, w, D]
        vis_t = vis.reshape(B, h_ * w_, cfg.hidden_dim)
        norm_vis = vis_t / jnp.linalg.norm(vis_t, axis=-1, keepdims=True)
        norm_lan = lan / jnp.linalg.norm(lan, axis=-1, keepdims=True)  # [B*S, D]

        scale = jnp.exp(self.logit_scale)
        if cfg.attn_multi > 0:
            # fusion per pair with T=1 text, exactly as at reference batch 1
            vis_rep = jnp.repeat(
                norm_vis.reshape(B, h_, w_, cfg.hidden_dim), S, axis=0
            )                                                     # [B*S, h, w, D]
            new_vis, new_lan = self.attn_fusion(vis_rep, norm_lan[:, None])
            norm_vis_p = new_vis.reshape(B * S, h_ * w_, cfg.hidden_dim) * 0.1 + vis_rep.reshape(
                B * S, h_ * w_, cfg.hidden_dim
            )
            norm_lan_p = new_lan[:, 0] * 0.1 + norm_lan
            score = scale * jnp.einsum("bpc,bc->bp", norm_vis_p, norm_lan_p)  # [B*S, hw]
            score = score.reshape(B, S, h_ * w_)
        else:
            score = scale * jnp.einsum("bpc,bsc->bsp", norm_vis, norm_lan.reshape(B, S, -1))

        seg = score.reshape(B * S, 1, h_, w_)
        seg = bilinear_resize(seg, (H, W), align_corners=False)
        return nn.relu(seg.reshape(B, S, H, W))
