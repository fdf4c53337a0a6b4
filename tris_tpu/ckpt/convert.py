"""PyTorch -> JAX weight conversion.

Maps torch ``state_dict`` key layouts (OpenAI CLIP checkpoints and the
reference's released TRIS stage-1/2 ``.pth`` files,
`/root/reference/CLIP/clip/model.py:607-644`, `utils/util.py:81-107`) onto the
flax parameter trees of :mod:`tris_tpu.models`. All weights are converted to
float32, matching the reference's ``clip_model.float()``
(model/model_stage1.py:31).

Layout rules:
  conv   [O, I, kh, kw] -> kernel [kh, kw, I, O]
  linear [O, I]         -> kernel [I, O]
  batchnorm weight/bias/running_mean/running_var -> scale/bias + mean/var
  layernorm weight -> scale (nested under our LayerNormFp32 as `<name>/ln`)
  nn.MultiheadAttention in_proj_weight [3C, C] -> in_proj_kernel [C, 3C]
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        arr = t
    else:  # torch tensor without importing torch at module scope
        arr = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
    arr = np.asarray(arr, dtype=np.float32)
    # NOTE: np.ascontiguousarray would promote 0-d scalars (logit_scale) to 1-d
    return arr if arr.flags["C_CONTIGUOUS"] else np.ascontiguousarray(arr)


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_entry(params: dict, stats: dict, path: Tuple[str, ...], key: str, val) -> bool:
    """Convert one torch (sub)key rooted at flax `path`. Returns handled?"""
    if key.endswith("num_batches_tracked"):
        return True
    arr = _np(val)

    # torch module path -> flax module path, handling our naming scheme
    parts = key.split(".")

    def flaxify(mod_parts):
        out = []
        i = 0
        while i < len(mod_parts):
            p = mod_parts[i]
            m = re.fullmatch(r"layer([1-4])", p)
            if m and i + 1 < len(mod_parts) and mod_parts[i + 1].isdigit():
                out.append(f"layer{m.group(1)}_{mod_parts[i+1]}")
                i += 2
                continue
            if p == "downsample":
                nxt = mod_parts[i + 1]
                out.append({"0": "ds_conv", "1": "ds_bn"}[nxt])
                i += 2
                continue
            if p == "transformer" and i + 1 < len(mod_parts) and mod_parts[i + 1] == "resblocks":
                out.append(f"block_{mod_parts[i+2]}")
                i += 3
                continue
            if p == "mlp":
                out.append(f"mlp_{mod_parts[i+1]}")
                i += 2
                continue
            out.append(p)
            i += 1
        return out

    mods, leaf = flaxify(parts[:-1]), parts[-1]
    mods = tuple(mods)
    last = mods[-1] if mods else ""

    # --- batch norm ---
    if last.startswith("bn") or last.startswith("ds_bn"):
        if leaf == "weight":
            _set(params, path + mods + ("scale",), arr)
        elif leaf == "bias":
            _set(params, path + mods + ("bias",), arr)
        elif leaf == "running_mean":
            _set(stats, path + mods + ("mean",), arr)
        elif leaf == "running_var":
            _set(stats, path + mods + ("var",), arr)
        else:
            return False
        return True

    # --- layer norm (wrapped in LayerNormFp32 -> <name>/ln) ---
    if last.startswith("ln_") or last == "ln":
        sub = "scale" if leaf == "weight" else "bias"
        _set(params, path + mods + ("ln", sub), arr)
        return True

    # --- conv ---
    if last.startswith("conv") or last == "ds_conv":
        assert leaf == "weight" and arr.ndim == 4, key
        _set(params, path + mods + ("kernel",), arr.transpose(2, 3, 1, 0))
        return True

    # --- fused MHA (torch nn.MultiheadAttention) ---
    if last == "attn" and leaf in ("in_proj_weight", "in_proj_bias"):
        if leaf == "in_proj_weight":
            _set(params, path + mods + ("in_proj_kernel",), arr.T)
        else:
            _set(params, path + mods + ("in_proj_bias",), arr)
        return True

    # --- embeddings / plain parameters (checked before the generic linear rule) ---
    if leaf == "weight" and mods and mods[-1] == "token_embedding":
        _set(params, path + mods + ("embedding",), arr)
        return True
    if leaf in ("positional_embedding", "class_embedding", "proj", "text_projection", "logit_scale"):
        _set(params, path + mods + (leaf,), arr)
        return True

    # --- linear (q/k/v/c_proj, out_proj, mlp_c_fc, mlp_c_proj, Wk ...) ---
    if leaf == "weight" and arr.ndim == 2:
        _set(params, path + mods + ("kernel",), arr.T)
        return True
    if leaf == "bias":
        _set(params, path + mods + ("bias",), arr)
        return True

    return False


def convert_clip_state_dict(state_dict: Dict[str, "np.ndarray"]) -> dict:
    """Convert an OpenAI-CLIP torch state_dict to flax variables.

    Returns ``{"params": ..., "batch_stats": ...}`` for :class:`tris_tpu.models.clip.CLIP`.
    """
    params: dict = {}
    stats: dict = {}
    for key, val in state_dict.items():
        if key in ("input_resolution", "context_length", "vocab_size"):
            continue
        if not _convert_entry(params, stats, (), key, val):
            raise ValueError(f"unhandled torch key: {key}")
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def infer_clip_config(state_dict: Dict[str, "np.ndarray"], txt_length: int = 20):
    """Infer a :class:`CLIPConfig` from a torch CLIP state_dict
    (mirrors the shape sniffing in CLIP/clip/model.py:607-630)."""
    from tris_tpu.models.clip import CLIPConfig

    is_vit = "visual.proj" in state_dict
    if is_vit:
        vision_width = state_dict["visual.conv1.weight"].shape[0]
        vision_layers = len(
            {k.split(".")[3] for k in state_dict if k.startswith("visual.transformer.resblocks.")}
        )
        vision_patch_size = state_dict["visual.conv1.weight"].shape[-1]
        grid = round((state_dict["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = vision_patch_size * grid
    else:
        counts = [
            len({k.split(".")[2] for k in state_dict if k.startswith(f"visual.layer{b}.")})
            for b in (1, 2, 3, 4)
        ]
        vision_layers = tuple(counts)
        vision_width = state_dict["visual.layer1.0.conv1.weight"].shape[0]
        vision_patch_size = None
        out_width = round((state_dict["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = out_width * 32

    return CLIPConfig(
        embed_dim=state_dict["text_projection"].shape[1],
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        transformer_width=state_dict["ln_final.weight"].shape[0],
        transformer_heads=state_dict["ln_final.weight"].shape[0] // 64,
        transformer_layers=len(
            {k.split(".")[2] for k in state_dict if k.startswith("transformer.resblocks.")}
        ),
        context_length=state_dict["positional_embedding"].shape[0],
        txt_length=txt_length,
        vocab_size=state_dict["token_embedding.weight"].shape[0],
    )


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.pt``/``.pth`` file to a numpy state_dict (host-side).

    Handles both plain state_dicts and TorchScript archives (the OpenAI CLIP
    release format, cf. CLIP/clip/clip.py:120-130)."""
    import torch

    try:
        obj = torch.jit.load(path, map_location="cpu").state_dict()
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):  # nn.Module
        obj = obj.state_dict()
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]  # reference save_checkpoint format (utils/util.py:50-77)
    return {k: _np(v) for k, v in obj.items() if hasattr(v, "shape") or isinstance(v, np.ndarray)}
