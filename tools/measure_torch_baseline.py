"""Measure the PyTorch reference's stage-1 inference throughput on this host.

The reference (fawnliu/TRIS) publishes no throughput numbers and this
environment has no CUDA GPU, so the best available anchor is the reference
code itself run with torch-CPU: TRIS stage-1 (CLIP-RN50) eval forward at
320px per the eval protocol of /root/reference/validate.py:173-186, with
seeded random weights (no network egress for the released checkpoints) on a
synthetic batch. The result is recorded in BASELINE.json under
``published.pytorch_images_per_sec`` with provenance, which bench.py uses for
its ``vs_baseline`` ratio. This is a *CPU floor*, clearly labeled as such —
the reference's GPU number would be higher, the TPU-vs-GPU claim is made by
the 10x-per-chip north star, not by this anchor.

Usage: python tools/measure_torch_baseline.py [--iters N] [--batch B]
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


def build_reference_stage1():
    """Reference TRIS stage-1 with seeded random CLIP-RN50 weights, eval mode."""
    import torch

    _stub_missing_modules()
    sys.path.insert(0, "/root/reference")
    import CLIP.clip as ref_clip
    from CLIP.clip import model as ref_clip_model

    def fake_load(name, device="cpu", jit=False, txt_length=20):
        torch.manual_seed(1234)
        return ref_clip_model.CLIP(**RN50_CFG, txt_length=txt_length).float(), None

    ref_clip.load = fake_load
    from model.model_stage1 import TRIS

    args = types.SimpleNamespace(
        bert_tokenizer="clip", backbone="clip-RN50", max_query_len=20,
        hidden_dim=1024, attn_multi=0.1, FOCAL_P=3.0, FOCAL_LAMBDA=0.01,
    )
    model = TRIS(args)
    model.eval()
    return model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=1, help="eval protocol is B=1 (validate.py:137)")
    ap.add_argument("--size", type=int, default=320)
    args = ap.parse_args()

    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    model = build_reference_stage1()

    x = torch.randn(args.batch, 3, args.size, args.size)
    ids = torch.zeros(args.batch, 20, dtype=torch.long)
    ids[:, 0], ids[:, 1], ids[:, 2] = 49406, 786, 49407

    with torch.no_grad():
        model(x, ids)  # warmup
        t0 = time.perf_counter()
        for _ in range(args.iters):
            model(x, ids)
        dt = time.perf_counter() - t0

    ips = args.batch * args.iters / dt
    provenance = (
        f"reference model/model_stage1.py TRIS (clip-RN50, random seeded weights) eval forward, "
        f"B={args.batch} {args.size}px, torch {torch.__version__} on {os.cpu_count()} CPU core(s) "
        f"of this host (no CUDA GPU available); CPU floor, not a GPU number"
    )

    path = os.path.join(REPO, "BASELINE.json")
    with open(path) as f:
        data = json.load(f)
    data.setdefault("published", {})
    data["published"]["pytorch_images_per_sec"] = round(ips, 3)
    data["published"]["pytorch_baseline_provenance"] = provenance
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
        f.write("\n")

    print(json.dumps({"pytorch_images_per_sec": round(ips, 3), "provenance": provenance}))


if __name__ == "__main__":
    main()
