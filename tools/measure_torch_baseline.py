"""Measure the PyTorch reference's throughput anchors on this host (CPU).

The reference (fawnliu/TRIS) publishes no throughput numbers and this
environment has no CUDA GPU, so the best available anchors are the reference
code itself run with torch-CPU, with seeded random weights (no network egress
for the released checkpoints) on synthetic batches. Results are recorded in
BASELINE.json under ``published.*`` with provenance; bench.py's modes use
them for their ``vs_baseline`` ratios. These are *CPU floors*, clearly
labeled as such — the reference's GPU numbers would be higher; the
TPU-vs-GPU claim is made by the 10x-per-chip north star, not by these.

Modes (mirroring bench.py's TRIS_BENCH_MODE):
  infer  stage-1 eval forward, B=1 320px (validate.py:173-186 protocol)
  train  full stage-1 train step: model fwd/bwd + frozen ViT-B/32 critic
         losses (l1 MaxLoss, l5 CBS python loop, l4 multilabel soft margin)
         + AdamW, reproducing train_stage1.py:301-372
  train2 stage-2 train step: 4 side-output BCE + EMA teacher consistency
         + AdamW (train_stage2.py:290-332); ema_pytorch is not installed
         here so the EMA teacher is a deepcopy + per-param lerp(0.999) with
         identical FLOPs/memory traffic
  eval   per-ref multi-sentence eval: S batch-1 model forwards per ref
         (validate.py:173-179), refs/s
  prms   PRMS selection: per ref, S model forwards + S^2 critic scorings at
         batch 1 (validate.py:311-328), refs/s

Usage: python tools/measure_torch_baseline.py [--mode M] [--iters N] [--batch B]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RN50_CFG = dict(
    embed_dim=1024, image_resolution=224, vision_layers=(3, 4, 6, 3), vision_width=64,
    vision_patch_size=None, context_length=77, vocab_size=49408,
    transformer_width=512, transformer_heads=8, transformer_layers=12,
)


def _stub_missing_modules():
    import packaging
    import packaging.version  # noqa: F401

    def stub(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules.setdefault(name, mod)
        return sys.modules[name]

    stub("pkg_resources", packaging=packaging)
    stub("ftfy", fix_text=lambda s: s)
    tvt = stub(
        "torchvision.transforms",
        Compose=object, Resize=object, CenterCrop=object, ToTensor=object,
        Normalize=object, InterpolationMode=types.SimpleNamespace(BICUBIC=3),
    )
    stub("torchvision", transforms=tvt)
    stub("tqdm", tqdm=lambda it, **k: it)


VIT_B32_CFG = dict(
    embed_dim=512, image_resolution=224, vision_layers=12, vision_width=768,
    vision_patch_size=32, context_length=77, vocab_size=49408,
    transformer_width=512, transformer_heads=8, transformer_layers=12,
)


def _patch_reference_clip_load():
    """Route the reference's clip.load to seeded random-weight construction
    (no egress for the released weights; throughput is weight-independent)."""
    import torch

    _stub_missing_modules()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import CLIP.clip as ref_clip
    from CLIP.clip import model as ref_clip_model

    def fake_load(name, device="cpu", jit=False, txt_length=20):
        torch.manual_seed(1234)
        cfg = VIT_B32_CFG if "ViT" in name else RN50_CFG
        return ref_clip_model.CLIP(**cfg, txt_length=txt_length).float(), None

    ref_clip.load = fake_load
    return ref_clip


def _model_args():
    return types.SimpleNamespace(
        bert_tokenizer="clip", backbone="clip-RN50", max_query_len=20,
        hidden_dim=1024, attn_multi=0.1, FOCAL_P=3.0, FOCAL_LAMBDA=0.01,
    )


def build_reference_stage1(train: bool = False):
    """Reference TRIS stage-1 with seeded random CLIP-RN50 weights."""
    _patch_reference_clip_load()
    from model.model_stage1 import TRIS

    model = TRIS(_model_args())
    model.train() if train else model.eval()
    return model


def build_reference_stage2(train: bool = False):
    """Reference TRIS stage-2 (PixelAttention + FPN decoder)."""
    _patch_reference_clip_load()
    from model.model_stage2 import TRIS

    model = TRIS(_model_args())
    model.train() if train else model.eval()
    return model


def build_reference_critic():
    """ViT-B/32 critic at txt_length=20 (train_stage1.py:164-168). The
    reference only calls .eval() — it does NOT set requires_grad=False, so
    its backward also computes (unused) critic param grads; keep that cost
    for a faithful anchor."""
    ref_clip = _patch_reference_clip_load()
    critic, _ = ref_clip.load("ViT-B/32", txt_length=20)
    critic.eval()
    return critic


def _ids(batch, torch):
    ids = torch.zeros(batch, 20, dtype=torch.long)
    ids[:, 0], ids[:, 1], ids[:, 2] = 49406, 786, 49407
    return ids


def measure_infer(args):
    """Stage-1 eval forward, B=1 (validate.py:137,173-186)."""
    import torch

    model = build_reference_stage1()
    x = torch.randn(args.batch, 3, args.size, args.size)
    ids = _ids(args.batch, torch)
    with torch.no_grad():
        model(x, ids)  # warmup
        t0 = time.perf_counter()
        for _ in range(args.iters):
            model(x, ids)
        dt = time.perf_counter() - t0
    return ("pytorch_images_per_sec", args.batch * args.iters / dt,
            f"reference model/model_stage1.py TRIS (clip-RN50, random seeded weights) eval "
            f"forward, B={args.batch} {args.size}px")


def measure_train(args):
    """Full stage-1 train step (train_stage1.py:301-372): model fwd ->
    CAM-modulated 224px fg images -> l1 MaxLoss through the critic, l5 CBS
    per-sample python loop over negatives, l4 multilabel soft margin ->
    backward -> AdamW."""
    import torch
    import torch.nn.functional as F

    model = build_reference_stage1(train=True)
    critic = build_reference_critic()

    # MaxLoss / clip_forward inlined from train_stage1.py:263-284 (importing
    # the module would drag the full torchvision/tensorboard dataset stack in)
    def clip_forward(clip_model, images, tokenized_text):
        image_features = clip_model.encode_image(images)
        _, text_features = clip_model.encode_text(tokenized_text)
        image_features = image_features / image_features.norm(dim=-1, keepdim=True)
        text_features = text_features / text_features.norm(dim=-1, keepdim=True)
        N, C = image_features.size()
        return torch.matmul(image_features.reshape(N, 1, C),
                            text_features.reshape(N, C, 1))

    def max_loss(x):
        x = x.clamp(0.0001, 0.9999)
        return -(torch.log(x)).mean()

    B, size, negs = args.batch, args.size, 3
    params = [p for p in model.parameters() if p.requires_grad]
    opt = torch.optim.AdamW(params, lr=5e-5, weight_decay=0.01)
    img = torch.randn(B, 3, size, size)
    ids = _ids(B, torch)
    neg_ids = _ids(B * negs, torch).reshape(B, negs, 20)
    labels = torch.eye(B)

    def step():
        cls, _, _, sig_out, _ = model(img, ids)
        cam_224 = F.interpolate(sig_out, (224, 224), mode="bilinear", align_corners=True)
        img_224 = F.interpolate(img, (224, 224), mode="bilinear", align_corners=True)
        fg = torch.stack([cam_224[i] * img_224[i] for i in range(B)], dim=0)
        l1 = max_loss(clip_forward(critic, fg, ids))
        image_features = critic.encode_image(fg)
        cbs = torch.tensor(0.0, requires_grad=True)
        for i_ in range(B):  # per-sample python loop, as the reference does
            _, tf = critic.encode_text(neg_ids[i_])
            f1 = image_features[i_].reshape(1, -1)
            f1 = f1 / f1.norm(dim=-1, keepdim=True)
            tf = tf / tf.norm(dim=-1, keepdim=True)
            neg_score = torch.matmul(f1, tf.transpose(0, 1))
            cbs = cbs + (-(torch.log(1 - neg_score)).mean())
        l5 = cbs / B
        l4 = F.multilabel_soft_margin_loss(cls, labels)
        loss = l1 * 1.0 + l4 * 5.0 + l5 * 2.0  # w1/w4/w5 defaults (args.py:69-80)
        opt.zero_grad()
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = time.perf_counter() - t0
    return ("pytorch_train_images_per_sec", B * args.iters / dt,
            f"reference train_stage1.py:301-372 full train step (model fwd/bwd + ViT-B/32 "
            f"critic losses incl. CBS loop + AdamW), random seeded weights, B={B} {size}px")


def measure_train2(args):
    """Stage-2 train step (train_stage2.py:290-332): 4 side-output BCE + EMA
    teacher consistency + AdamW. ema_pytorch is unavailable here; the EMA
    teacher is a deepcopy updated by per-param lerp(decay=0.999) after each
    step — the same teacher-forward + per-param traffic."""
    import copy

    import torch
    import torch.nn.functional as F

    model = build_reference_stage2(train=True)
    teacher = copy.deepcopy(model)
    # the reference's EMA copy stays in train mode (nn.Module default at
    # EMA(model) time, train_stage2.py:258-260) and only train mode returns
    # the 4 side outputs (model_stage2.py:130)
    teacher.train()
    for p in teacher.parameters():
        p.requires_grad_(False)

    B, size = args.batch, args.size
    opt = torch.optim.AdamW([p for p in model.parameters() if p.requires_grad],
                            lr=5e-5, weight_decay=0.01)
    img = torch.randn(B, 3, size, size)
    ids = _ids(B, torch)
    pseudo = (torch.rand(B, 1, size, size) > 0.5).float()

    def sigmoid_mse(a, b):
        return F.mse_loss(torch.sigmoid(a), torch.sigmoid(b))

    def step():
        o1, o2, o3, o4 = model(img, ids)
        with torch.no_grad():
            e1, e2, e3, e4 = teacher(img, ids)
        l5 = sum(sigmoid_mse(o, e) for o, e in zip((o1, o2, o3, o4), (e1, e2, e3, e4)))
        loss = sum(F.binary_cross_entropy_with_logits(o, pseudo) for o in (o1, o2, o3, o4)) + l5
        opt.zero_grad()
        loss.backward()
        opt.step()
        with torch.no_grad():
            for pt, ps in zip(teacher.parameters(), model.parameters()):
                pt.lerp_(ps, 1.0 - 0.999)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = time.perf_counter() - t0
    return ("pytorch_train2_images_per_sec", B * args.iters / dt,
            f"reference train_stage2.py:290-332 train step (4-output BCE + EMA teacher "
            f"sigmoid-MSE consistency + AdamW; EMA via deepcopy+lerp(0.999) since "
            f"ema_pytorch is not installed), random seeded weights, B={B} {size}px")


def measure_eval(args):
    """Per-ref eval: S separate batch-1 model forwards (validate.py:173-179)."""
    import torch

    model = build_reference_stage1()
    S = args.sents
    x = torch.randn(1, 3, args.size, args.size)
    ids = _ids(S, torch)
    with torch.no_grad():
        model(x, ids[:1])  # warmup
        t0 = time.perf_counter()
        for _ in range(args.iters):
            for j in range(S):
                model(x, ids[j : j + 1])
        dt = time.perf_counter() - t0
    return ("pytorch_eval_refs_per_sec", args.iters / dt,
            f"reference validate.py:173-179 per-ref eval: S={S} batch-1 model forwards per "
            f"ref, random seeded weights, {args.size}px")


def measure_prms(args):
    """PRMS: per ref, S model forwards + S^2 critic scorings at batch 1
    (validate.py:311-328)."""
    import torch
    import torch.nn.functional as F

    # get_scores inlined from validate.py:120-127 (importing the module would
    # drag the torchvision/cv2 eval stack in)
    def get_scores(clip_model, fg_224_eval, word_id):
        image_features = clip_model.encode_image(fg_224_eval)
        _, text_features = clip_model.encode_text(word_id)
        image_features = image_features / image_features.norm(dim=-1, keepdim=True)
        text_features = text_features / text_features.norm(dim=-1, keepdim=True)
        return image_features @ text_features.t()

    model = build_reference_stage1()
    critic = build_reference_critic()
    S = args.sents
    x = torch.randn(1, 3, args.size, args.size)
    ids = _ids(S, torch)

    def one_ref():
        img_224 = F.interpolate(x, (224, 224), mode="bilinear", align_corners=True)
        best = (-1.0, -1)
        for j in range(S):
            output = model(x, ids[j : j + 1])
            cam_224 = F.interpolate(output, (224, 224), mode="bilinear", align_corners=True)
            fg = torch.stack([cam_224[i] * img_224[i] for i in range(1)], dim=0)
            score = 0.0
            for i_ in range(S):
                score += get_scores(critic, fg, ids[i_ : i_ + 1]).item()
            if score > best[0]:
                best = (score, j)
        return best

    with torch.no_grad():
        one_ref()  # warmup
        t0 = time.perf_counter()
        for _ in range(args.iters):
            one_ref()
        dt = time.perf_counter() - t0
    return ("pytorch_prms_refs_per_sec", args.iters / dt,
            f"reference validate.py:311-328 PRMS: per ref S={S} model forwards + S^2 "
            f"ViT-B/32 critic scorings at batch 1, random seeded weights, {args.size}px")


_MODES = {
    "infer": measure_infer,
    "train": measure_train,
    "train2": measure_train2,
    "eval": measure_eval,
    "prms": measure_prms,
}

_DEFAULTS = {  # (iters, batch)
    "infer": (5, 1),
    "train": (2, 48),
    "train2": (2, 48),
    "eval": (3, 1),
    "prms": (3, 1),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=sorted(_MODES), default="infer")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None,
                    help="eval protocol is B=1 (validate.py:137); train recipe B=48")
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--sents", type=int, default=4,
                    help="sentences per ref for eval/prms (matches bench.py TRIS_BENCH_SENTS)")
    args = ap.parse_args()
    d_iters, d_batch = _DEFAULTS[args.mode]
    args.iters = args.iters if args.iters is not None else d_iters
    args.batch = args.batch if args.batch is not None else d_batch

    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    key, value, what = _MODES[args.mode](args)
    provenance = (
        f"{what}, torch {torch.__version__} on {os.cpu_count()} CPU core(s) of this host "
        f"(no CUDA GPU available); CPU floor, not a GPU number"
    )

    path = os.path.join(REPO, "BASELINE.json")
    with open(path) as f:
        data = json.load(f)
    data.setdefault("published", {})
    data["published"][key] = round(value, 3)
    data["published"][key + "_provenance" if args.mode != "infer" else "pytorch_baseline_provenance"] = provenance
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
        f.write("\n")

    print(json.dumps({key: round(value, 3), "provenance": provenance}))


if __name__ == "__main__":
    main()
