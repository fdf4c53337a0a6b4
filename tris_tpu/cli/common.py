"""Shared CLI helpers: model construction, weight init/conversion, datasets."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tris_tpu.config import backbone_name
from tris_tpu.models.clip import CLIP, CLIP_CONFIGS
from tris_tpu.models.stage1 import Stage1Config, TRISStage1
from tris_tpu.models.stage2 import Stage2Config, TRISStage2


def resolve_dataset(args) -> Tuple[str, str]:
    """Map CLI dataset names to (refer dataset, splitBy)."""
    name = args.dataset
    if name == "refcocog_umd":
        return "refcocog", "umd"
    if name == "refcocog_google":
        return "refcocog", "google"
    if name == "refcocog":
        return "refcocog", args.splitBy or "umd"
    if name == "refcoco+":
        return "refcoco+", "unc"
    return name, args.splitBy


def merge_backbone_variables(variables: dict, clip_variables: dict) -> dict:
    """Replace the randomly-initialized backbone subtree with converted CLIP
    weights (reference: clip.load at model construction, model_stage1.py:29)."""
    params = dict(variables["params"])
    params["backbone"] = clip_variables["params"]
    stats = dict(variables.get("batch_stats", {}))
    if "batch_stats" in clip_variables:
        stats["backbone"] = clip_variables["batch_stats"]
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def build_stage1(args, train: bool = True):
    cfg = Stage1Config(
        backbone=backbone_name(args),
        hidden_dim=args.hidden_dim,
        txt_length=args.max_query_len,
        attn_multi=args.attn_multi,
        focal_p=args.FOCAL_P,
        focal_lambda=args.FOCAL_LAMBDA,
    )
    dtype = jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32
    model = TRISStage1(cfg, dtype=dtype)
    img = jnp.zeros((2, args.size, args.size, 3), jnp.float32)
    ids = jnp.ones((2, args.max_query_len), jnp.int32)
    variables = jax.jit(lambda k: model.init(k, img, ids, train=train))(
        jax.random.PRNGKey(args.seed)
    )
    variables = jax.tree_util.tree_map(np.asarray, variables)
    variables = _maybe_load_clip(args, variables)
    return model, variables


def build_stage2(args, train: bool = True):
    cfg = Stage2Config(backbone=backbone_name(args), txt_length=args.max_query_len)
    dtype = jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32
    model = TRISStage2(cfg, dtype=dtype)
    img = jnp.zeros((2, args.size, args.size, 3), jnp.float32)
    ids = jnp.ones((2, args.max_query_len), jnp.int32)
    variables = jax.jit(lambda k: model.init(k, img, ids, train=True))(
        jax.random.PRNGKey(args.seed)
    )
    variables = jax.tree_util.tree_map(np.asarray, variables)
    variables = _maybe_load_clip(args, variables)
    return model, variables


def _maybe_load_clip(args, variables: dict) -> dict:
    path = getattr(args, "clip_weights", None)
    if not path:
        return variables
    from tris_tpu.ckpt.convert import convert_clip_state_dict, load_torch_checkpoint

    sd = load_torch_checkpoint(path)
    return merge_backbone_variables(variables, convert_clip_state_dict(sd))


def build_critic(args):
    """Frozen ViT-B/32 critic (train_stage1.py:164-168, validate.py:279-284)."""
    import dataclasses

    cfg = dataclasses.replace(CLIP_CONFIGS["ViT-B-32"], txt_length=args.max_query_len)
    critic = CLIP(cfg)
    path = getattr(args, "critic_weights", None)
    if path:
        from tris_tpu.ckpt.convert import convert_clip_state_dict, load_torch_checkpoint

        critic_vars = convert_clip_state_dict(load_torch_checkpoint(path))
    else:
        res = cfg.image_resolution
        img = jnp.zeros((1, res, res, 3), jnp.float32)
        ids = jnp.ones((1, args.max_query_len), jnp.int32)
        critic_vars = jax.jit(lambda k: critic.init(k, img, ids))(jax.random.PRNGKey(7))
    return critic, critic_vars


def load_pretrained(args, model, variables, stage: str):
    """--pretrain: restore weights from our msgpack or a torch .pth (auto-convert)."""
    path = args.pretrain
    if not path:
        return variables
    if path.endswith((".pth", ".pt")):
        from tris_tpu.ckpt.convert import load_torch_checkpoint
        from tris_tpu.ckpt.convert_tris import (
            convert_stage1_state_dict,
            convert_stage2_state_dict,
        )

        sd = load_torch_checkpoint(path)
        conv = convert_stage1_state_dict if stage == "stage1" else convert_stage2_state_dict
        return conv(sd)
    from tris_tpu.ckpt.io import load_variables

    payload = load_variables(path)
    if "params" in payload:
        out = {"params": payload["params"]}
        if "batch_stats" in payload:
            out["batch_stats"] = payload["batch_stats"]
        return out
    return payload


def build_loaders(args, train: bool, eval_splits=None):
    from tris_tpu.data.dataset import Loader, ReferSegDataset

    dataset, split_by = resolve_dataset(args)
    loaders = {}
    if train:
        ds = ReferSegDataset(
            args.refer_data_root, dataset, split_by, "train", size=args.size,
            max_tokens=args.max_query_len, eval_mode=False,
            negative_samples=args.negative_samples, pseudo_path=args.pseudo_path,
        )
        loaders["train"] = Loader(
            ds, args.batch_size, shuffle=True, seed=args.seed,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
    for split in (eval_splits or []):
        ds = ReferSegDataset(
            args.refer_data_root, dataset, split_by, split, size=args.size,
            max_tokens=args.max_query_len, eval_mode=True,
        )
        loaders[split] = Loader(
            ds, args.eval_batch, shuffle=False, drop_last=False,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
    return loaders
