"""Stage-2 TRIS: pseudo-supervised encoder-decoder segmentation network.

Re-design of `/root/reference/model/model_stage2.py`: CLIP pyramid features
fused with language via :class:`PixelAttention` at c2/c3/c4 (+residual,
model_stage2.py:115-117), an FPN-style top-down decoder
(model_stage2.py:119-127), and four side outputs upsampled to input size
(model_stage2.py:128-134). Trains with BCE against IRNet pseudo-masks.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from tris_tpu.models.clip import CLIP, CLIP_CONFIGS, CLIPConfig
from tris_tpu.models.fusion import PixelAttention
from tris_tpu.models.layers import PReLU, TorchBatchNorm
from tris_tpu.ops.resize import bilinear_resize


@dataclasses.dataclass(frozen=True)
class Stage2Config:
    backbone: str = "RN50"
    txt_length: int = 20
    clip_override: "CLIPConfig | None" = None  # for tests / custom backbones

    @property
    def clip_config(self) -> CLIPConfig:
        base = self.clip_override or CLIP_CONFIGS[self.backbone]
        return dataclasses.replace(base, txt_length=self.txt_length)


class ConvBNRelu(nn.Module):
    """3x3 Conv (no bias) + BN + PReLU (model_stage2.py:11-27)."""

    features: int
    kernel: int = 3
    use_act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), padding=((pad, pad), (pad, pad)),
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = TorchBatchNorm(dtype=self.dtype, name="bn")(x, use_running_average=not train)
        if self.use_act:
            x = PReLU(dtype=self.dtype, name="act")(x)
        return x


class SegHead(nn.Module):
    """ConvBNRelu -> 1x1 conv to 1 channel (final_seg heads, model_stage2.py:74-85)."""

    mid: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBNRelu(self.mid, dtype=self.dtype, name="conv1")(x, train=train)
        return nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype, name="conv2")(x)


def _up_to(x: jnp.ndarray, hw) -> jnp.ndarray:
    """Bilinear NHWC upsample (align_corners=False, as model/utils.py:5-10)."""
    y = x.transpose(0, 3, 1, 2)
    y = bilinear_resize(y, hw, align_corners=False)
    return y.transpose(0, 2, 3, 1)


class TRISStage2(nn.Module):
    config: Stage2Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        clip_cfg = cfg.clip_config
        self.backbone = CLIP(clip_cfg, dtype=self.dtype)
        l_chans = clip_cfg.transformer_width  # 512 for RN50/RN101
        w = clip_cfg.vision_width
        v_chans = (w * 4, w * 8, w * 16, w * 32)  # (256, 512, 1024, 2048) at w=64
        self.attention2 = PixelAttention(v_chans[1], l_chans, dtype=self.dtype)
        self.attention3 = PixelAttention(v_chans[2], l_chans, dtype=self.dtype)
        self.attention4 = PixelAttention(v_chans[3], l_chans, dtype=self.dtype)
        self.reduced_c1 = ConvBNRelu(64, dtype=self.dtype)
        self.reduced_c2 = ConvBNRelu(128, dtype=self.dtype)
        self.reduced_c3 = ConvBNRelu(256, dtype=self.dtype)
        self.reduced_c4 = ConvBNRelu(512, dtype=self.dtype)
        self.output4 = ConvBNRelu(256, dtype=self.dtype)
        self.output3 = ConvBNRelu(128, dtype=self.dtype)
        self.output2 = ConvBNRelu(64, dtype=self.dtype)
        self.output1 = ConvBNRelu(32, dtype=self.dtype)
        self.final_seg1 = SegHead(32, dtype=self.dtype)
        self.final_seg2 = SegHead(32, dtype=self.dtype)
        self.final_seg3 = SegHead(64, dtype=self.dtype)
        self.final_seg4 = SegHead(64, dtype=self.dtype)

    def __call__(self, image: jnp.ndarray, word_ids: jnp.ndarray, train: bool = False):
        """image: [B, H, W, 3]; word_ids: [B, L].

        Returns logits [B, H, W, 1] (eval) or a 4-tuple of side-output logits (train).
        """
        B, H, W, _ = image.shape
        word_embedding, _ = self.backbone.encode_text(word_ids)   # [B, T, 512]
        c1, c2, c3, c4, _ = self.backbone.encode_image(image, train=train)
        return self._decode(c1, c2, c3, c4, word_embedding, (H, W), train)

    def response_maps(self, image: jnp.ndarray, word_ids: jnp.ndarray) -> jnp.ndarray:
        """Multi-sentence eval maps: [B, H, W, 3] x [B, S, L] -> [B, S, H, W].

        The CLIP trunk runs ONCE per image and its pyramid is shared across
        the image's S sentences. Every op after the trunk (PixelAttention,
        decoder, BN with running stats) is per-sample, so this equals the
        reference's per-sentence batch-1 eval forwards (validate.py:173-179)
        exactly while skipping the S-fold trunk recompute.
        """
        B, S, L = word_ids.shape
        H, W = image.shape[1], image.shape[2]
        word_embedding, _ = self.backbone.encode_text(word_ids.reshape(B * S, L))
        c1, c2, c3, c4, _ = self.backbone.encode_image(image, train=False)
        c1, c2, c3, c4 = (jnp.repeat(c, S, axis=0) for c in (c1, c2, c3, c4))
        out = self._decode(c1, c2, c3, c4, word_embedding, (H, W), train=False)
        return out.reshape(B, S, H, W)

    def _decode(self, c1, c2, c3, c4, word_embedding, hw, train: bool):
        H, W = hw
        f2 = self.attention2(c2, word_embedding) + c2
        f3 = self.attention3(c3, word_embedding) + c3
        f4 = self.attention4(c4, word_embedding) + c4

        dem1 = self.reduced_c1(c1, train=train)
        dem2 = self.reduced_c2(f2, train=train)
        dem3 = self.reduced_c3(f3, train=train)
        dem4 = self.reduced_c4(f4, train=train)

        seg4 = _up_to(self.output4(dem4, train=train), dem3.shape[1:3])
        seg3 = _up_to(self.output3(seg4 + dem3, train=train), dem2.shape[1:3])
        seg2 = _up_to(self.output2(seg3 + dem2, train=train), dem1.shape[1:3])
        seg1 = self.output1(seg2 + dem1, train=train)

        out1 = _up_to(self.final_seg1(seg1, train=train), (H, W))
        if not train:
            return out1
        out2 = _up_to(self.final_seg2(seg2, train=train), (H, W))
        out3 = _up_to(self.final_seg3(seg3, train=train), (H, W))
        out4 = _up_to(self.final_seg4(seg4, train=train), (H, W))
        return out1, out2, out3, out4
