"""Full-model activation parity vs the *actual* reference torch modules.

Instantiates the reference networks from /root/reference with seeded random
weights on CPU (no pretrained downloads — `clip.load` / `model_zoo.load_url`
are monkeypatched to return randomly-initialized modules), converts their real
``state_dict()``s through :mod:`tris_tpu.ckpt.convert` /
:mod:`tris_tpu.ckpt.convert_tris`, and asserts forward activations match at
full size (320px / 20 tokens; IRNet at its 512px crop).

Reference modules under test (imported read-only as torch oracles):
  - CLIP/clip/model.py:451 (CLIP, RN50 + ViT-B/32 builds)
  - model/model_stage1.py:14 (TRIS stage 1)
  - model/model_stage2.py:38 (TRIS stage 2)
  - IRNet/net/resnet50_irn.py:13,225 (Net, EdgeDisplacement)

Without network egress this is the strongest available proxy for
released-checkpoint mIoU parity: it proves converter + forward-math
equivalence on the exact module trees the released .pth files serialize.
"""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from tris_tpu.ckpt.convert import convert_clip_state_dict, infer_clip_config
from tris_tpu.ckpt.convert_tris import (
    convert_irnet_state_dict,
    convert_stage1_state_dict,
    convert_stage2_state_dict,
)
from tris_tpu.models.clip import CLIP
from tris_tpu.models.stage1 import Stage1Config, TRISStage1
from tris_tpu.models.stage2 import Stage2Config, TRISStage2
from tris_tpu.pseudo.irnet import IRNet, edge_displacement_infer

TOL = 1e-4  # relative to the output's max magnitude

REF_CLIP_CFGS = {
    "RN50": dict(
        embed_dim=1024, image_resolution=224, vision_layers=(3, 4, 6, 3), vision_width=64,
        vision_patch_size=None, context_length=77, vocab_size=49408,
        transformer_width=512, transformer_heads=8, transformer_layers=12,
    ),
    "ViT-B/32": dict(
        embed_dim=512, image_resolution=224, vision_layers=12, vision_width=768,
        vision_patch_size=32, context_length=77, vocab_size=49408,
        transformer_width=512, transformer_heads=8, transformer_layers=12,
    ),
}


@pytest.fixture(scope="module")
def ref():
    """Import the reference model modules with missing deps stubbed out."""
    import torch

    stubbed = {}

    def stub(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        stubbed[name] = sys.modules.get(name)
        sys.modules[name] = mod
        return mod

    import packaging  # the real module; pkg_resources itself is absent
    import packaging.version  # noqa: F401  (bind the submodule attribute)

    stub("pkg_resources", packaging=packaging)
    stub("ftfy", fix_text=lambda s: s)
    tvt = stub(
        "torchvision.transforms",
        Compose=object, Resize=object, CenterCrop=object, ToTensor=object,
        Normalize=object, InterpolationMode=types.SimpleNamespace(BICUBIC=3),
    )
    stub("torchvision", transforms=tvt)
    try:
        import tqdm  # noqa: F401
    except ImportError:
        stub("tqdm", tqdm=lambda it, **k: it)

    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/IRNet")
    try:
        import CLIP.clip as ref_clip
        from CLIP.clip import model as ref_clip_model
        from net import resnet50 as ref_resnet50

        # random-init CLIP instead of downloading released weights
        def fake_load(name, device="cpu", jit=False, txt_length=20):
            torch.manual_seed(1234)
            m = ref_clip_model.CLIP(**REF_CLIP_CFGS[name], txt_length=txt_length)
            return m.float(), None

        ref_clip.load = fake_load
        ref_resnet50.model_zoo.load_url = lambda *a, **k: {}

        from model.model_stage1 import TRIS as RefTRIS1
        from model.model_stage2 import TRIS as RefTRIS2
        from net import resnet50_irn as ref_irn

        yield types.SimpleNamespace(
            torch=torch,
            clip=ref_clip,
            clip_model=ref_clip_model,
            TRIS1=RefTRIS1,
            TRIS2=RefTRIS2,
            irn=ref_irn,
        )
    finally:
        sys.path.remove("/root/reference")
        sys.path.remove("/root/reference/IRNet")
        for name, old in stubbed.items():
            if old is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = old


def _assert_close(ours, theirs, name, tol=TOL):
    ours = np.asarray(ours, np.float64)
    theirs = np.asarray(theirs, np.float64)
    assert ours.shape == theirs.shape, f"{name}: shape {ours.shape} vs {theirs.shape}"
    scale = max(1.0, float(np.abs(theirs).max()))
    err = float(np.abs(ours - theirs).max())
    assert err <= tol * scale, f"{name}: max abs err {err:.3e} (scale {scale:.3e})"


def _perturb(model, seed):
    """Randomize every parameter (breaks the zero-init bn3 scales etc. so the
    comparison exercises all branches)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.02)


def _calibrate_bn(model, forward, iters=8):
    """Set every BatchNorm's running stats to its actual input statistics so
    eval-mode activations stay well-conditioned under random weights (random
    init + (0,1) running stats would blow up through 50 layers and make a
    tolerance comparison meaningless).

    Stats converge over a few passes (each pass's inputs depend on upstream
    stats from the previous pass); early passes can transiently overflow, so
    the recorded stats are nan/inf-sanitized and clamped."""
    import torch

    hooks = []

    def make_hook(bn):
        def hook(mod, inp, out):
            with torch.no_grad():
                x = inp[0]
                m = torch.nan_to_num(x.mean(dim=(0, 2, 3)), nan=0.0, posinf=0.0, neginf=0.0)
                v = torch.nan_to_num(
                    x.var(dim=(0, 2, 3), unbiased=False), nan=1.0, posinf=1.0, neginf=1.0
                )
                mod.running_mean.copy_(m.clamp(-1e8, 1e8))
                mod.running_var.copy_(v.clamp(1e-3, 1e12))

        return hook

    for m in model.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            hooks.append(m.register_forward_hook(make_hook(m)))
    with torch.no_grad():
        for _ in range(iters):
            forward()
    for h in hooks:
        h.remove()


def _tokens(B, L=20, seed=0):
    """CLIP-style token rows: SOT, random ids, EOT (= max id, so argmax finds
    it, model.py:562), zero padding; varying lengths."""
    rng = np.random.default_rng(seed)
    ids = np.zeros((B, L), np.int64)
    for b in range(B):
        n = int(rng.integers(4, L + 1))
        ids[b, 0] = 49406
        ids[b, 1 : n - 1] = rng.integers(1, 49000, n - 2)
        ids[b, n - 1] = 49407
    return ids


def _images(B, H, W, seed=0):
    return np.random.default_rng(seed).standard_normal((B, 3, H, W)).astype(np.float32)


def test_clip_rn50_full_parity(ref):
    torch = ref.torch
    tm, _ = ref.clip.load("RN50", txt_length=20)
    _perturb(tm, 1)
    tm.eval()

    img = _images(2, 320, 320, seed=2)
    timg = torch.from_numpy(img)
    _calibrate_bn(tm, lambda: tm.encode_image(timg))

    sd = {k: v for k, v in tm.state_dict().items()}
    cfg = infer_clip_config(sd, txt_length=20)
    variables = convert_clip_state_dict(sd)
    ours = CLIP(cfg)

    ids = _tokens(2, seed=3)
    with torch.no_grad():
        ref_seq, ref_hidden = tm.encode_text(torch.from_numpy(ids))
        ref_c1, ref_c2, ref_c3, ref_c4, (ref_g, ref_local) = tm.encode_image(timg)

    seq, hidden = ours.apply(variables, jnp.asarray(ids, jnp.int32), method="encode_text")
    _assert_close(seq, ref_seq.numpy(), "rn50.encode_text.seq")
    _assert_close(hidden, ref_hidden.numpy(), "rn50.encode_text.hidden")

    c1, c2, c3, c4, (g, local) = ours.apply(
        variables, jnp.asarray(img.transpose(0, 2, 3, 1)), method="encode_image"
    )
    for name, a, b in [("c1", c1, ref_c1), ("c2", c2, ref_c2), ("c3", c3, ref_c3), ("c4", c4, ref_c4)]:
        _assert_close(np.asarray(a).transpose(0, 3, 1, 2), b.numpy(), f"rn50.{name}")
    _assert_close(g, ref_g.numpy(), "rn50.attnpool.global")
    _assert_close(np.asarray(local).transpose(0, 3, 1, 2), ref_local.numpy(), "rn50.attnpool.local")


def test_clip_vitb32_full_parity(ref):
    torch = ref.torch
    tm, _ = ref.clip.load("ViT-B/32", txt_length=20)
    _perturb(tm, 4)
    tm.eval()

    sd = {k: v for k, v in tm.state_dict().items()}
    cfg = infer_clip_config(sd, txt_length=20)
    variables = convert_clip_state_dict(sd)
    ours = CLIP(cfg)

    img = _images(2, 224, 224, seed=5)
    ids = _tokens(2, seed=6)
    with torch.no_grad():
        ref_img_feat = tm.encode_image(torch.from_numpy(img))
        ref_logits, _ = tm(torch.from_numpy(img), torch.from_numpy(ids))

    img_feat = ours.apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1)), method="encode_image")
    _assert_close(img_feat, ref_img_feat.numpy(), "vit.encode_image")
    logits, _ = ours.apply(
        variables, jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(ids, jnp.int32)
    )
    _assert_close(logits, ref_logits.numpy(), "vit.logits_per_image")


def _stage1_args():
    return types.SimpleNamespace(
        bert_tokenizer="clip", backbone="clip-RN50", max_query_len=20,
        hidden_dim=1024, attn_multi=0.1, FOCAL_P=3.0, FOCAL_LAMBDA=0.01,
    )


def test_stage1_full_parity(ref):
    torch = ref.torch
    torch.manual_seed(7)
    tm = ref.TRIS1(_stage1_args())
    _perturb(tm, 8)
    tm.eval()

    B = 3
    img = _images(B, 320, 320, seed=9)
    ids = _tokens(B, seed=10)
    timg, tids = torch.from_numpy(img), torch.from_numpy(ids)
    _calibrate_bn(tm, lambda: tm(timg, tids))

    variables = convert_stage1_state_dict({k: v for k, v in tm.state_dict().items()})
    ours = TRISStage1(Stage1Config(backbone="RN50", hidden_dim=1024, txt_length=20))
    jimg = jnp.asarray(img.transpose(0, 2, 3, 1))
    jids = jnp.asarray(ids, jnp.int32)

    with torch.no_grad():
        ref_map = tm(timg, tids)
    seg = ours.apply(variables, jimg, jids, train=False)
    _assert_close(np.asarray(seg).transpose(0, 3, 1, 2), ref_map.numpy(), "stage1.eval.relu_map")

    # train-mode head outputs (BN batch stats on both sides)
    tm.train()
    with torch.no_grad():
        ref_cls, ref_fg, ref_relu, ref_sig, ref_scale = tm(timg, tids)
    tm.eval()
    cls_out, cls_fg, relu_map, sig_map, scale = ours.apply(
        variables, jimg, jids, train=True, mutable=["batch_stats"]
    )[0]
    _assert_close(cls_out, ref_cls.numpy(), "stage1.train.cls_out")
    _assert_close(cls_fg, ref_fg.numpy(), "stage1.train.cls_fg")
    _assert_close(np.asarray(relu_map).transpose(0, 3, 1, 2), ref_relu.numpy(), "stage1.train.relu")
    _assert_close(np.asarray(sig_map).transpose(0, 3, 1, 2), ref_sig.numpy(), "stage1.train.sigmoid")
    _assert_close(scale, ref_scale.detach().numpy(), "stage1.train.logit_scale")


def test_stage2_full_parity(ref):
    torch = ref.torch
    torch.manual_seed(11)
    tm = ref.TRIS2(_stage1_args())
    _perturb(tm, 12)
    tm.eval()

    B = 2
    img = _images(B, 320, 320, seed=13)
    ids = _tokens(B, seed=14)
    timg, tids = torch.from_numpy(img), torch.from_numpy(ids)
    _calibrate_bn(tm, lambda: tm(timg, tids))

    variables = convert_stage2_state_dict({k: v for k, v in tm.state_dict().items()})
    ours = TRISStage2(Stage2Config(backbone="RN50", txt_length=20))
    jimg = jnp.asarray(img.transpose(0, 2, 3, 1))
    jids = jnp.asarray(ids, jnp.int32)

    with torch.no_grad():
        ref_logits = tm(timg, tids)
    logits = ours.apply(variables, jimg, jids, train=False)
    _assert_close(np.asarray(logits).transpose(0, 3, 1, 2), ref_logits.numpy(), "stage2.eval.logits")

    tm.train()
    with torch.no_grad():
        ref_outs = tm(timg, tids)
    tm.eval()
    outs = ours.apply(variables, jimg, jids, train=True, mutable=["batch_stats"])[0]
    for i, (a, b) in enumerate(zip(outs, ref_outs), 1):
        _assert_close(np.asarray(a).transpose(0, 3, 1, 2), b.numpy(), f"stage2.train.out{i}")


def test_irnet_full_parity(ref):
    torch = ref.torch
    torch.manual_seed(15)
    tm = ref.irn.EdgeDisplacement()  # crop 512, stride 4 (resnet50_irn.py:227)
    _perturb(tm, 16)
    with torch.no_grad():
        tm.mean_shift.running_mean.add_(torch.randn(2, generator=torch.Generator().manual_seed(17)) * 0.1)
    tm.eval()

    img = _images(1, 512, 512, seed=18)[0]
    pair = torch.from_numpy(np.stack([img, img[:, :, ::-1].copy()]))
    _calibrate_bn(tm, lambda: ref.irn.Net.forward(tm, pair))

    variables = convert_irnet_state_dict({k: v for k, v in tm.state_dict().items()})
    ours = IRNet()

    # raw Net forward; the reference applies MeanShift inside fc_dp7 in eval
    # mode (resnet50_irn.py:124-128), so mirror with apply_mean_shift=True
    with torch.no_grad():
        ref_edge_raw, ref_dp_raw = ref.irn.Net.forward(tm, pair)
    edge_raw, dp_raw = ours.apply(
        variables,
        jnp.asarray(np.stack([img, img[:, :, ::-1]]).transpose(0, 2, 3, 1)),
        apply_mean_shift=True,
    )
    _assert_close(np.asarray(edge_raw).transpose(0, 3, 1, 2), ref_edge_raw.numpy(), "irnet.edge_raw")
    _assert_close(np.asarray(dp_raw).transpose(0, 3, 1, 2), ref_dp_raw.numpy(), "irnet.dp_raw")

    # EdgeDisplacement inference head (hflip-averaged sigmoid edge + shifted dp)
    with torch.no_grad():
        ref_edge, ref_dp = tm(pair)
    edge, disp = edge_displacement_infer(ours, variables, jnp.asarray(img.transpose(1, 2, 0)))
    _assert_close(edge, ref_edge.numpy()[0], "irnet.infer.edge")
    _assert_close(disp, ref_dp.numpy(), "irnet.infer.disp")
