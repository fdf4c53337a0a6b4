"""Converters for the reference's released TRIS checkpoints and IRNet weights.

Maps the torch module trees of `/root/reference/model/model_stage1.py`,
`model/model_stage2.py`, `model/attn.py` and `IRNet/net/resnet50_irn.py` onto
our flax parameter trees, on top of the CLIP rules in
:mod:`tris_tpu.ckpt.convert`. 1x1 convs (2d and 1d) become Dense kernels.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from tris_tpu.ckpt.convert import _convert_entry, _np, _set


def _dense_from_conv(arr: np.ndarray) -> np.ndarray:
    """Conv2d 1x1 [O, I, 1, 1] or Conv1d [O, I, 1] weight -> Dense kernel [I, O]."""
    if arr.ndim == 4:
        arr = arr[:, :, 0, 0]
    elif arr.ndim == 3:
        arr = arr[:, :, 0]
    return arr.T


def _put_linearish(params: dict, path, leaf: str, arr: np.ndarray):
    if leaf == "weight":
        if arr.ndim > 2:
            _set(params, path + ("kernel",), _dense_from_conv(arr))
        else:
            _set(params, path + ("kernel",), arr.T)
    else:
        _set(params, path + ("bias",), arr)


def _put_instance_norm(params: dict, path, leaf: str, arr: np.ndarray):
    _set(params, path + ("scale" if leaf == "weight" else "bias",), arr)


def _convert_bilateral_prompt(params: dict, base, key: str, arr: np.ndarray) -> bool:
    """attn_fusion (model/attn.py:68-136): v_projK.{0 conv,1 IN}, t_projK.0,
    v_output.{0,1}, t_output.0."""
    m = re.fullmatch(r"(v_proj[123]|v_output)\.([01])\.(weight|bias)", key)
    if m:
        name, idx, leaf = m.groups()
        sub = f"{name}_fc" if idx == "0" else f"{name}_in"
        if idx == "0":
            _put_linearish(params, base + (sub,), leaf, arr)
        else:
            _put_instance_norm(params, base + (sub,), leaf, arr)
        return True
    m = re.fullmatch(r"(t_proj[123]|t_output)\.0\.(weight|bias)", key)
    if m:
        name, leaf = m.groups()
        _put_linearish(params, base + (f"{name}_fc",), leaf, arr)
        return True
    return False


def _convert_pixel_attention(params: dict, base, key: str, arr: np.ndarray) -> bool:
    """PixelAttention (model/attn.py:9-65): Wk/Wv conv1d, Wq/Wm/Ww/Wo conv2d,
    ins_q/ins_w InstanceNorm."""
    m = re.fullmatch(r"(W[kvqmwo]|Wo|Ww)\.(weight|bias)", key)
    if m:
        name, leaf = m.groups()
        _put_linearish(params, base + (name,), leaf, arr)
        return True
    m = re.fullmatch(r"(ins_[qw])\.(weight|bias)", key)
    if m:
        name, leaf = m.groups()
        _put_instance_norm(params, base + (name,), leaf, arr)
        return True
    return False


def _convert_conv_bn_relu(params: dict, stats: dict, base, key: str, arr: np.ndarray) -> bool:
    """ConvBNRelu (model_stage2.py:11-27): conv/bn/relu(PReLU) -> conv/bn/act."""
    if key == "conv.weight":
        _set(params, base + ("conv", "kernel"), arr.transpose(2, 3, 1, 0))
        return True
    m = re.fullmatch(r"bn\.(weight|bias|running_mean|running_var|num_batches_tracked)", key)
    if m:
        leaf = m.group(1)
        if leaf == "num_batches_tracked":
            return True
        if leaf == "weight":
            _set(params, base + ("bn", "scale"), arr)
        elif leaf == "bias":
            _set(params, base + ("bn", "bias"), arr)
        elif leaf == "running_mean":
            _set(stats, base + ("bn", "mean"), arr)
        else:
            _set(stats, base + ("bn", "var"), arr)
        return True
    if key == "relu.weight":
        _set(params, base + ("act", "alpha"), arr)
        return True
    return False


def convert_stage1_state_dict(state_dict: Dict[str, np.ndarray]) -> dict:
    """Reference TRIS stage-1 checkpoint -> flax variables for TRISStage1."""
    params: dict = {}
    stats: dict = {}
    for key, val in state_dict.items():
        arr = _np(val)
        if key.startswith("backbone."):
            if not _convert_entry(params, stats, ("backbone",), key[len("backbone."):], val):
                raise ValueError(f"unhandled backbone key: {key}")
        elif key.startswith("vis_project."):
            _put_linearish(params, ("vis_project",), key.split(".")[-1], arr)
        elif key.startswith("lan_project."):
            _put_linearish(params, ("lan_project",), key.split(".")[-1], arr)
        elif key == "logit_scale":
            _set(params, ("logit_scale",), arr)
        elif key.startswith("attn_fusion."):
            if not _convert_bilateral_prompt(params, ("attn_fusion",), key[len("attn_fusion."):], arr):
                raise ValueError(f"unhandled attn_fusion key: {key}")
        else:
            raise ValueError(f"unhandled stage1 key: {key}")
    return {"params": params, "batch_stats": stats}


def convert_stage2_state_dict(state_dict: Dict[str, np.ndarray]) -> dict:
    """Reference TRIS stage-2 checkpoint -> flax variables for TRISStage2."""
    params: dict = {}
    stats: dict = {}
    for key, val in state_dict.items():
        arr = _np(val)
        if key.startswith("backbone."):
            if not _convert_entry(params, stats, ("backbone",), key[len("backbone."):], val):
                raise ValueError(f"unhandled backbone key: {key}")
            continue
        m = re.fullmatch(r"(attention[234])\.(.+)", key)
        if m and _convert_pixel_attention(params, (m.group(1),), m.group(2), arr):
            continue
        m = re.fullmatch(r"(reduced_c[1-4]|output[1-4])\.(.+)", key)
        if m and _convert_conv_bn_relu(params, stats, (m.group(1),), m.group(2), arr):
            continue
        m = re.fullmatch(r"(final_seg[1-4])\.0\.(.+)", key)
        if m and _convert_conv_bn_relu(params, stats, (m.group(1), "conv1"), m.group(2), arr):
            continue
        m = re.fullmatch(r"(final_seg[1-4])\.1\.weight", key)
        if m:
            _set(params, (m.group(1), "conv2", "kernel"), arr.transpose(2, 3, 1, 0))
            continue
        raise ValueError(f"unhandled stage2 key: {key}")
    return {"params": params, "batch_stats": stats}


def convert_irnet_state_dict(state_dict: Dict[str, np.ndarray]) -> dict:
    """Reference IRNet (resnet50_irn) checkpoint -> flax variables for IRNet."""
    params: dict = {}
    stats: dict = {}
    for key, val in state_dict.items():
        arr = _np(val)
        if key.endswith("num_batches_tracked"):
            continue
        if key in ("mean_shift.running_mean", "fc_dp7.4.running_mean"):
            # the MeanShift module is aliased inside the fc_dp7 Sequential
            # (resnet50_irn.py:108-114), so real state_dicts carry both keys
            _set(stats, ("mean_shift",), arr)
            continue
        if key.startswith("resnet50."):
            sub = key[len("resnet50."):]
            if not _convert_entry(params, stats, ("trunk",), sub, val):
                raise ValueError(f"unhandled trunk key: {key}")
            continue
        # stageN.* are aliases of resnet50 modules; skip duplicates
        if re.match(r"stage[1-5]\.", key):
            continue
        m = re.fullmatch(r"(fc_edge[1-5]|fc_dp[1-6])\.0\.weight", key)
        if m:
            _set(params, (f"{m.group(1)}_conv", "kernel"), arr.transpose(2, 3, 1, 0))
            continue
        m = re.fullmatch(r"(fc_edge[1-5]|fc_dp[1-6])\.1\.(weight|bias)", key)
        if m:
            _set(params, (f"{m.group(1)}_gn", "scale" if m.group(2) == "weight" else "bias"), arr)
            continue
        m = re.fullmatch(r"fc_edge6\.(weight|bias)", key)
        if m:
            leaf = "kernel" if m.group(1) == "weight" else "bias"
            a = arr.transpose(2, 3, 1, 0) if m.group(1) == "weight" else arr
            _set(params, ("fc_edge6", leaf), a)
            continue
        m = re.fullmatch(r"fc_dp7\.0\.weight", key)
        if m:
            _set(params, ("fc_dp7_conv1", "kernel"), arr.transpose(2, 3, 1, 0))
            continue
        m = re.fullmatch(r"fc_dp7\.1\.(weight|bias)", key)
        if m:
            _set(params, ("fc_dp7_gn", "scale" if m.group(1) == "weight" else "bias"), arr)
            continue
        m = re.fullmatch(r"fc_dp7\.3\.weight", key)
        if m:
            _set(params, ("fc_dp7_conv2", "kernel"), arr.transpose(2, 3, 1, 0))
            continue
        # edge_layers / dp_layers / backbone ModuleList aliases
        if re.match(r"(edge_layers|dp_layers|backbone)\.", key):
            continue
        raise ValueError(f"unhandled irnet key: {key}")
    return {"params": params, "batch_stats": stats}
