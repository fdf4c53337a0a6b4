"""Shared tiny-model fixtures for fast unit tests."""

from tris_tpu.models.clip import CLIPConfig

TINY_RESNET_CLIP = CLIPConfig(
    embed_dim=64,
    image_resolution=64,
    vision_layers=(1, 1, 1, 1),
    vision_width=16,
    vision_patch_size=None,
    transformer_width=32,
    transformer_heads=4,
    transformer_layers=2,
    context_length=77,
    txt_length=20,
    vocab_size=49408,
)

TINY_VIT_CLIP = CLIPConfig(
    embed_dim=64,
    image_resolution=64,
    vision_layers=2,
    vision_width=64,  # vision_heads = width // 64 must be >= 1
    vision_patch_size=16,
    transformer_width=32,
    transformer_heads=4,
    transformer_layers=2,
    context_length=77,
    txt_length=20,
    vocab_size=49408,
)
