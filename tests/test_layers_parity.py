"""Numerical parity of flax building blocks against PyTorch ops.

The torch sides here are assembled from torch.nn primitives inside the tests
(fresh test-only code) to validate that converted pre-trained weights will
reproduce reference activations.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from tris_tpu.ckpt.convert import _convert_entry
from tris_tpu.models.layers import (
    AttentionPool2d,
    InstanceNorm2d,
    LayerNormFp32,
    PReLU,
    ResidualAttentionBlock,
    TorchBatchNorm,
    causal_mask,
    multi_head_attention,
    quick_gelu,
)


def test_batchnorm_matches_torch_train_and_eval(rng):
    """TorchBatchNorm vs torch.nn.BatchNorm2d: eval folded affine, train
    batch-stat normalization, AND the running-stat update (torch stores the
    UNBIASED batch variance — the fidelity gap flax.BatchNorm has)."""
    C = 6
    x = rng.standard_normal((4, 5, 7, C)).astype(np.float32)
    tb = torch.nn.BatchNorm2d(C, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tb.weight.copy_(torch.from_numpy(rng.standard_normal(C).astype(np.float32)))
        tb.bias.copy_(torch.from_numpy(rng.standard_normal(C).astype(np.float32)))
        tb.running_mean.copy_(torch.from_numpy(rng.standard_normal(C).astype(np.float32) * 0.2))
        tb.running_var.copy_(torch.from_numpy(rng.random(C).astype(np.float32) + 0.5))

    bn = TorchBatchNorm()
    variables = {
        "params": {"scale": tb.weight.detach().numpy(), "bias": tb.bias.detach().numpy()},
        "batch_stats": {"mean": tb.running_mean.numpy().copy(), "var": tb.running_var.numpy().copy()},
    }
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))

    # eval
    tb.eval()
    with torch.no_grad():
        ref = tb(tx).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(bn.apply(variables, jnp.asarray(x), use_running_average=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    # train: output uses biased batch stats; running update uses unbiased var
    tb.train()
    with torch.no_grad():
        ref_train = tb(tx).numpy().transpose(0, 2, 3, 1)
    got_train, mut = bn.apply(
        variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(got_train), ref_train, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]), tb.running_mean.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]), tb.running_var.numpy(), rtol=1e-5, atol=1e-6
    )


def to_flax(state_dict, extra_path=()):
    params, stats = {}, {}
    for k, v in state_dict.items():
        handled = _convert_entry(params, stats, tuple(extra_path), k, v.detach().numpy())
        assert handled, k
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def test_quick_gelu(rng):
    x = rng.standard_normal((4, 8)).astype(np.float32)
    want = (torch.from_numpy(x) * torch.sigmoid(1.702 * torch.from_numpy(x))).numpy()
    np.testing.assert_allclose(np.asarray(quick_gelu(x)), want, atol=1e-6)


def test_mha_op_matches_torch(rng):
    """Our raw attention vs torch F.multi_head_attention_forward with identity projections."""
    N, L, C, H = 2, 7, 16, 4
    q = rng.standard_normal((N, L, C)).astype(np.float32)
    got = np.asarray(multi_head_attention(jnp.array(q), jnp.array(q), jnp.array(q), H))
    tq = torch.from_numpy(q).transpose(0, 1)  # [L, N, C]
    eye = torch.eye(C)
    want, _ = TF.multi_head_attention_forward(
        tq, tq, tq, C, H,
        in_proj_weight=None, in_proj_bias=torch.zeros(3 * C),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
        out_proj_weight=eye, out_proj_bias=torch.zeros(C),
        use_separate_proj_weight=True,
        q_proj_weight=eye, k_proj_weight=eye, v_proj_weight=eye,
        need_weights=False,
    )
    np.testing.assert_allclose(got, want.transpose(0, 1).numpy(), atol=1e-5)


def test_residual_attention_block_matches_torch(rng):
    C, heads, L, N = 32, 4, 10, 3
    attn = torch.nn.MultiheadAttention(C, heads)
    ln_1 = torch.nn.LayerNorm(C)
    ln_2 = torch.nn.LayerNorm(C)
    c_fc = torch.nn.Linear(C, 4 * C)
    c_proj = torch.nn.Linear(4 * C, C)
    for m in (attn, ln_1, ln_2, c_fc, c_proj):
        for p in m.parameters():
            p.data = torch.randn_like(p) * 0.05

    state = {}
    for name, mod in [("attn", attn), ("ln_1", ln_1), ("ln_2", ln_2),
                      ("mlp.c_fc", c_fc), ("mlp.c_proj", c_proj)]:
        for k, v in mod.state_dict().items():
            state[f"{name}.{k}"] = v

    x = rng.standard_normal((N, L, C)).astype(np.float32)
    mask = torch.triu(torch.full((L, L), float("-inf")), diagonal=1)

    with torch.no_grad():
        tx = torch.from_numpy(x).transpose(0, 1)  # [L, N, C]
        h = tx + attn(ln_1(tx), ln_1(tx), ln_1(tx), need_weights=False, attn_mask=mask)[0]
        g = ln_2(h)
        g = c_proj(c_fc(g) * torch.sigmoid(1.702 * c_fc(g)))
        want = (h + g).transpose(0, 1).numpy()

    block = ResidualAttentionBlock(C, heads)
    variables = to_flax(state)
    got = np.asarray(block.apply(variables, jnp.array(x), attn_mask=causal_mask(L)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_attention_pool_matches_torch(rng):
    S, C, heads, out_dim, N, H, W = 4, 32, 4, 16, 2, 5, 7
    q_proj = torch.nn.Linear(C, C)
    k_proj = torch.nn.Linear(C, C)
    v_proj = torch.nn.Linear(C, C)
    c_proj = torch.nn.Linear(C, out_dim)
    pos = torch.randn(S * S + 1, C) * 0.1
    for m in (q_proj, k_proj, v_proj, c_proj):
        for p in m.parameters():
            p.data = torch.randn_like(p) * 0.1

    x = rng.standard_normal((N, C, H, W)).astype(np.float32)
    with torch.no_grad():
        tx = torch.from_numpy(x).reshape(N, C, H * W).permute(2, 0, 1)  # (HW)NC
        tx = torch.cat([tx.mean(dim=0, keepdim=True), tx], dim=0)
        spatial = TF.interpolate(
            pos[1:].reshape(1, S, S, C).permute(0, 3, 1, 2), size=(H, W), mode="bilinear"
        ).reshape(C, H * W).permute(1, 0)
        pe = torch.cat([pos[:1], spatial], dim=0)
        tx = tx + pe[:, None, :]
        want, _ = TF.multi_head_attention_forward(
            tx, tx, tx, C, heads,
            in_proj_weight=None,
            in_proj_bias=torch.cat([q_proj.bias, k_proj.bias, v_proj.bias]),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
            out_proj_weight=c_proj.weight, out_proj_bias=c_proj.bias,
            use_separate_proj_weight=True,
            q_proj_weight=q_proj.weight, k_proj_weight=k_proj.weight, v_proj_weight=v_proj.weight,
            need_weights=False,
        )
        want = want.permute(1, 2, 0)  # [N, out, HW+1]
        want_global = want[:, :, 0].numpy()
        want_map = want[:, :, 1:].reshape(N, out_dim, H, W).numpy()

    state = {"positional_embedding": pos}
    for name, mod in [("q_proj", q_proj), ("k_proj", k_proj), ("v_proj", v_proj), ("c_proj", c_proj)]:
        for k, v in mod.state_dict().items():
            state[f"{name}.{k}"] = v
    variables = to_flax(state)

    pool = AttentionPool2d(spacial_dim=S, embed_dim=C, num_heads=heads, output_dim=out_dim)
    got_global, got_map = pool.apply(variables, jnp.array(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_global), want_global, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got_map).transpose(0, 3, 1, 2), want_map, atol=2e-5, rtol=1e-4
    )


def test_instance_norm_matches_torch(rng):
    C = 6
    x = rng.standard_normal((2, C, 5, 4)).astype(np.float32)
    tin = torch.nn.InstanceNorm2d(C, affine=True)
    tin.weight.data = torch.randn(C)
    tin.bias.data = torch.randn(C)
    with torch.no_grad():
        want = tin(torch.from_numpy(x)).numpy()
    variables = {"params": {"scale": tin.weight.detach().numpy(), "bias": tin.bias.detach().numpy()}}
    got = InstanceNorm2d(C).apply(variables, jnp.array(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5)


def test_prelu_matches_torch(rng):
    x = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    tp = torch.nn.PReLU()
    tp.weight.data = torch.tensor([0.11])
    with torch.no_grad():
        want = tp(torch.from_numpy(x)).numpy()
    got = PReLU().apply({"params": {"alpha": np.array([0.11], np.float32)}}, jnp.array(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_bottleneck_matches_torch(rng):
    """CLIP anti-aliased bottleneck (stride-2 with downsample), eval-mode BN."""
    from tris_tpu.models.clip import Bottleneck

    inplanes, planes, stride = 16, 8, 2
    out_ch = planes * 4

    conv1 = torch.nn.Conv2d(inplanes, planes, 1, bias=False)
    bn1 = torch.nn.BatchNorm2d(planes)
    conv2 = torch.nn.Conv2d(planes, planes, 3, padding=1, bias=False)
    bn2 = torch.nn.BatchNorm2d(planes)
    conv3 = torch.nn.Conv2d(planes, out_ch, 1, bias=False)
    bn3 = torch.nn.BatchNorm2d(out_ch)
    ds_conv = torch.nn.Conv2d(inplanes, out_ch, 1, bias=False)
    ds_bn = torch.nn.BatchNorm2d(out_ch)
    mods = {"conv1": conv1, "bn1": bn1, "conv2": conv2, "bn2": bn2, "conv3": conv3,
            "bn3": bn3, "downsample.0": ds_conv, "downsample.1": ds_bn}
    for m in mods.values():
        for p in m.parameters():
            p.data = torch.randn_like(p) * 0.1
        if hasattr(m, "running_mean"):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.1
            m.running_var.data = torch.rand_like(m.running_var) + 0.5
        m.eval()

    x = rng.standard_normal((2, inplanes, 8, 8)).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x)
        h = TF.relu(bn1(conv1(t)))
        h = TF.relu(bn2(conv2(h)))
        h = TF.avg_pool2d(h, stride)
        h = bn3(conv3(h))
        idn = ds_bn(ds_conv(TF.avg_pool2d(t, stride)))
        want = TF.relu(h + idn).numpy()

    state = {}
    for name, mod in mods.items():
        for k, v in mod.state_dict().items():
            state[f"{name}.{k}"] = v
    variables = to_flax(state)
    block = Bottleneck(planes=planes, stride=stride)
    got = block.apply(variables, jnp.array(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4, rtol=1e-3)


def test_layernorm_fp32(rng):
    C = 16
    x = rng.standard_normal((3, C)).astype(np.float32)
    tln = torch.nn.LayerNorm(C)
    tln.weight.data = torch.randn(C)
    tln.bias.data = torch.randn(C)
    with torch.no_grad():
        want = tln(torch.from_numpy(x)).numpy()
    variables = {"params": {"ln": {"scale": tln.weight.detach().numpy(), "bias": tln.bias.detach().numpy()}}}
    got = LayerNormFp32(C).apply(variables, jnp.array(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
