"""Converter coverage tests: synthesize torch state_dicts with the exact key
layout of OpenAI CLIP RN50 / TRIS checkpoints, convert, and require the result
to match the flax model's expected variable tree (names + shapes) exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from tris_tpu.ckpt.convert import convert_clip_state_dict, infer_clip_config
from tris_tpu.ckpt.convert_tris import (
    convert_irnet_state_dict,
    convert_stage1_state_dict,
    convert_stage2_state_dict,
)
from tris_tpu.models.clip import CLIP, CLIP_CONFIGS
from tris_tpu.models.stage1 import Stage1Config, TRISStage1
from tris_tpu.models.stage2 import Stage2Config, TRISStage2
from tris_tpu.pseudo.irnet import IRNet


def _bn(sd, name, ch):
    sd[f"{name}.weight"] = np.zeros(ch)
    sd[f"{name}.bias"] = np.zeros(ch)
    sd[f"{name}.running_mean"] = np.zeros(ch)
    sd[f"{name}.running_var"] = np.ones(ch)
    sd[f"{name}.num_batches_tracked"] = np.zeros(())


def _conv(sd, name, o, i, k):
    sd[f"{name}.weight"] = np.zeros((o, i, k, k))


def _linear(sd, name, o, i, bias=True):
    sd[f"{name}.weight"] = np.zeros((o, i))
    if bias:
        sd[f"{name}.bias"] = np.zeros(o)


def _ln(sd, name, ch):
    sd[f"{name}.weight"] = np.zeros(ch)
    sd[f"{name}.bias"] = np.zeros(ch)


def make_clip_rn50_state_dict(width=64, layers=(3, 4, 6, 3), embed_dim=1024,
                              t_width=512, t_layers=12, res=224, vocab=49408):
    sd = {}
    # stem
    _conv(sd, "visual.conv1", width // 2, 3, 3)
    _bn(sd, "visual.bn1", width // 2)
    _conv(sd, "visual.conv2", width // 2, width // 2, 3)
    _bn(sd, "visual.bn2", width // 2)
    _conv(sd, "visual.conv3", width, width // 2, 3)
    _bn(sd, "visual.bn3", width)
    # residual stages (CLIP bottleneck: downsample on every first block)
    inp = width
    for stage, (blocks, planes) in enumerate(zip(layers, [width, width * 2, width * 4, width * 8]), 1):
        for b in range(blocks):
            base = f"visual.layer{stage}.{b}"
            _conv(sd, f"{base}.conv1", planes, inp, 1)
            _bn(sd, f"{base}.bn1", planes)
            _conv(sd, f"{base}.conv2", planes, planes, 3)
            _bn(sd, f"{base}.bn2", planes)
            _conv(sd, f"{base}.conv3", planes * 4, planes, 1)
            _bn(sd, f"{base}.bn3", planes * 4)
            if b == 0:
                _conv(sd, f"{base}.downsample.0", planes * 4, inp, 1)
                _bn(sd, f"{base}.downsample.1", planes * 4)
            inp = planes * 4
    # attnpool
    C = width * 32
    sd["visual.attnpool.positional_embedding"] = np.zeros(((res // 32) ** 2 + 1, C))
    for p in ("q_proj", "k_proj", "v_proj"):
        _linear(sd, f"visual.attnpool.{p}", C, C)
    _linear(sd, "visual.attnpool.c_proj", embed_dim, C)
    # text transformer
    for i in range(t_layers):
        base = f"transformer.resblocks.{i}"
        sd[f"{base}.attn.in_proj_weight"] = np.zeros((3 * t_width, t_width))
        sd[f"{base}.attn.in_proj_bias"] = np.zeros(3 * t_width)
        _linear(sd, f"{base}.attn.out_proj", t_width, t_width)
        _ln(sd, f"{base}.ln_1", t_width)
        _ln(sd, f"{base}.ln_2", t_width)
        _linear(sd, f"{base}.mlp.c_fc", 4 * t_width, t_width)
        _linear(sd, f"{base}.mlp.c_proj", t_width, 4 * t_width)
    sd["token_embedding.weight"] = np.zeros((vocab, t_width))
    sd["positional_embedding"] = np.zeros((77, t_width))
    _ln(sd, "ln_final", t_width)
    sd["text_projection"] = np.zeros((t_width, embed_dim))
    sd["logit_scale"] = np.zeros(())
    return sd


def _expected_tree(model, *init_args, **init_kw):
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), *init_args, **init_kw))
    return {
        coll: {k: v.shape for k, v in flatten_dict(tree).items()}
        for coll, tree in shapes.items()
    }


def _converted_tree(variables):
    return {
        coll: {k: np.asarray(v).shape for k, v in flatten_dict(tree).items()}
        for coll, tree in variables.items()
    }


def _assert_same_tree(converted, expected):
    for coll in expected:
        missing = set(expected[coll]) - set(converted.get(coll, {}))
        extra = set(converted.get(coll, {})) - set(expected[coll])
        assert not missing, f"{coll} missing: {sorted(missing)[:8]}"
        assert not extra, f"{coll} extra: {sorted(extra)[:8]}"
        for k in expected[coll]:
            assert tuple(converted[coll][k]) == tuple(expected[coll][k]), (
                k, converted[coll][k], expected[coll][k])


def test_clip_rn50_converter_full_coverage():
    sd = make_clip_rn50_state_dict()
    cfg = infer_clip_config(sd, txt_length=20)
    assert cfg.vision_layers == (3, 4, 6, 3)
    assert cfg.embed_dim == 1024
    variables = convert_clip_state_dict(sd)
    model = CLIP(cfg)
    expected = _expected_tree(model, jnp.zeros((1, 224, 224, 3)), jnp.ones((1, 20), jnp.int32))
    _assert_same_tree(_converted_tree(variables), expected)


def test_stage1_converter_full_coverage():
    sd = {}
    for k, v in make_clip_rn50_state_dict().items():
        sd["backbone." + k] = v
    D = 1024
    sd["vis_project.weight"] = np.zeros((D, 2048, 1, 1))
    sd["vis_project.bias"] = np.zeros(D)
    _linear(sd, "lan_project", D, 1024)
    sd["logit_scale"] = np.zeros(())
    for p in ("v_proj1", "v_proj2", "v_proj3"):
        sd[f"attn_fusion.{p}.0.weight"] = np.zeros((D, D, 1, 1))
        sd[f"attn_fusion.{p}.0.bias"] = np.zeros(D)
        sd[f"attn_fusion.{p}.1.weight"] = np.zeros(D)
        sd[f"attn_fusion.{p}.1.bias"] = np.zeros(D)
    for p in ("t_proj1", "t_proj2", "t_proj3"):
        _linear(sd, f"attn_fusion.{p}.0", D, D)
    sd["attn_fusion.v_output.0.weight"] = np.zeros((D, D, 1, 1))
    sd["attn_fusion.v_output.0.bias"] = np.zeros(D)
    sd["attn_fusion.v_output.1.weight"] = np.zeros(D)
    sd["attn_fusion.v_output.1.bias"] = np.zeros(D)
    _linear(sd, "attn_fusion.t_output.0", D, D)

    variables = convert_stage1_state_dict(sd)
    model = TRISStage1(Stage1Config(backbone="RN50"))
    expected = _expected_tree(
        model, jnp.zeros((2, 320, 320, 3)), jnp.ones((2, 20), jnp.int32), train=False
    )
    _assert_same_tree(_converted_tree(variables), expected)


def test_stage2_converter_full_coverage():
    sd = {}
    for k, v in make_clip_rn50_state_dict().items():
        sd["backbone." + k] = v
    l_chans = 512
    for idx, ci in zip((2, 3, 4), (512, 1024, 2048)):
        base = f"attention{idx}"
        sd[f"{base}.Wk.weight"] = np.zeros((ci, l_chans, 1))
        sd[f"{base}.Wk.bias"] = np.zeros(ci)
        sd[f"{base}.Wv.weight"] = np.zeros((ci, l_chans, 1))
        sd[f"{base}.Wv.bias"] = np.zeros(ci)
        for p in ("Wq", "Wm", "Ww", "Wo"):
            sd[f"{base}.{p}.weight"] = np.zeros((ci, ci, 1, 1))
            sd[f"{base}.{p}.bias"] = np.zeros(ci)
        for p in ("ins_q", "ins_w"):
            sd[f"{base}.{p}.weight"] = np.zeros(ci)
            sd[f"{base}.{p}.bias"] = np.zeros(ci)

    def conv_bn_relu(base, o, i):
        sd[f"{base}.conv.weight"] = np.zeros((o, i, 3, 3))
        _bn(sd, f"{base}.bn", o)
        sd[f"{base}.relu.weight"] = np.zeros(1)

    for idx, (i, o) in zip((1, 2, 3, 4), ((256, 64), (512, 128), (1024, 256), (2048, 512))):
        conv_bn_relu(f"reduced_c{idx}", o, i)
    for idx, (i, o) in zip((4, 3, 2, 1), ((512, 256), (256, 128), (128, 64), (64, 32))):
        conv_bn_relu(f"output{idx}", o, i)
    for idx, (i, m) in zip((1, 2, 3, 4), ((32, 32), (64, 32), (128, 64), (256, 64))):
        conv_bn_relu(f"final_seg{idx}.0", m, i)
        sd[f"final_seg{idx}.1.weight"] = np.zeros((1, m, 1, 1))

    variables = convert_stage2_state_dict(sd)
    model = TRISStage2(Stage2Config(backbone="RN50"))
    # train=True so the train-only side heads (final_seg2..4) materialize
    expected = _expected_tree(
        model, jnp.zeros((2, 320, 320, 3)), jnp.ones((2, 20), jnp.int32), train=True
    )
    _assert_same_tree(_converted_tree(variables), expected)


def test_irnet_converter_full_coverage():
    sd = {}
    # torchvision resnet50 trunk
    _conv(sd, "resnet50.conv1", 64, 3, 7)
    _bn(sd, "resnet50.bn1", 64)
    inp = 64
    for stage, (blocks, planes) in enumerate(zip((3, 4, 6, 3), (64, 128, 256, 512)), 1):
        for b in range(blocks):
            base = f"resnet50.layer{stage}.{b}"
            _conv(sd, f"{base}.conv1", planes, inp, 1)
            _bn(sd, f"{base}.bn1", planes)
            _conv(sd, f"{base}.conv2", planes, planes, 3)
            _bn(sd, f"{base}.bn2", planes)
            _conv(sd, f"{base}.conv3", planes * 4, planes, 1)
            _bn(sd, f"{base}.bn3", planes * 4)
            if b == 0:
                _conv(sd, f"{base}.downsample.0", planes * 4, inp, 1)
                _bn(sd, f"{base}.downsample.1", planes * 4)
            inp = planes * 4
    # heads
    for i, ci in zip(range(1, 6), (64, 256, 512, 1024, 2048)):
        sd[f"fc_edge{i}.0.weight"] = np.zeros((32, ci, 1, 1))
        sd[f"fc_edge{i}.1.weight"] = np.zeros(32)
        sd[f"fc_edge{i}.1.bias"] = np.zeros(32)
    sd["fc_edge6.weight"] = np.zeros((1, 160, 1, 1))
    sd["fc_edge6.bias"] = np.zeros(1)
    for i, (ci, co) in zip(range(1, 7), ((64, 64), (256, 128), (512, 256), (1024, 256), (2048, 256), (768, 256))):
        sd[f"fc_dp{i}.0.weight"] = np.zeros((co, ci, 1, 1))
        sd[f"fc_dp{i}.1.weight"] = np.zeros(co)
        sd[f"fc_dp{i}.1.bias"] = np.zeros(co)
    sd["fc_dp7.0.weight"] = np.zeros((256, 448, 1, 1))
    sd["fc_dp7.1.weight"] = np.zeros(256)
    sd["fc_dp7.1.bias"] = np.zeros(256)
    sd["fc_dp7.3.weight"] = np.zeros((2, 256, 1, 1))
    sd["mean_shift.running_mean"] = np.zeros(2)

    variables = convert_irnet_state_dict(sd)
    model = IRNet()
    expected = _expected_tree(model, jnp.zeros((1, 64, 64, 3)))
    _assert_same_tree(_converted_tree(variables), expected)
