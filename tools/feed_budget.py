"""Multi-chip input-feed budget: measured per-core decode rate x Loader
threading x per-process sharding -> cores-per-chip arithmetic (VERDICT r4
next #5).

Measures, on COCO-shaped synthetic JPEGs (640x480; q90 and q95 photo-like
content), the PRODUCTION image path `data/transforms.py::load_transformed`
(decode -> 320px bilinear -> ImageNet normalize):

  1. per-core img/s, native fused decode ON / OFF / fast (TRIS_FAST_DECODE);
  2. the Loader's threaded batch pipeline end-to-end (train_example without
     tokenization cost — ids are pre-tokenized in production) at several
     thread counts. On a 1-core host the threads measure overhead, not
     scaling; PIL/libjpeg release the GIL, so per-core rates multiply across
     cores (the 8-thread scaling claim in docs/PERF_NOTES.md).

The budget: stage-1 training consumes ~602 img/s/chip (BENCH_EXTRA), so
cores-per-chip = 602 / per-core-rate; an N-chip host needs N x that many
cores, and multi-host feeds shard per-process (docs/MULTIHOST.md).

Run: python tools/feed_budget.py [n_images]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

TRAIN_RATE = 602.0  # img/s/chip, stage-1 train step (BENCH_EXTRA.json)


def make_jpegs(root, n, quality, seed=0):
    """Photo-like JPEGs: smooth low-frequency content + texture noise, the
    size/decode cost profile of COCO train2014 (~640x480)."""
    from scipy import ndimage

    rng = np.random.default_rng(seed)
    paths = []
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        h, w = 480, 640
        base = ndimage.zoom(rng.random((h // 16, w // 16, 3)), (16, 16, 1), order=1)
        tex = rng.normal(0, 0.05, (h, w, 3))
        arr = np.clip((base + tex) * 255, 0, 255).astype(np.uint8)
        p = os.path.join(root, f"img_{quality}_{i:04d}.jpg")
        Image.fromarray(arr).save(p, quality=quality)
        paths.append(p)
    return paths


def rate(paths, reps=3):
    from tris_tpu.data.transforms import load_transformed

    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for p in paths:
            out = load_transformed(p, 320)
        dt = time.perf_counter() - t0
        best = max(best, len(paths) / dt)
    assert out.shape[0] == 320
    return best


def loader_rate(paths, threads, batch_size=48):
    """The Loader's actual threaded pipeline over a stub dataset whose
    train_example is the image transform (ids precomputed, as production)."""
    from tris_tpu.data.dataset import Loader
    from tris_tpu.data.transforms import load_transformed

    ids = np.zeros((20,), np.int32)

    class _DS:
        eval_mode = False

        def __len__(self):
            return len(paths)

        def train_example(self, i, rng):
            return {"image": load_transformed(paths[i], 320), "word_ids": ids}

    loader = Loader(_DS(), batch_size=batch_size, shuffle=False, drop_last=False,
                    num_threads=threads)
    nb = 0
    t0 = time.perf_counter()
    for b in loader.epoch(0):
        nb += b["image"].shape[0]
    return nb / (time.perf_counter() - t0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    import tempfile

    ncores = os.cpu_count()
    print(f"host cores: {ncores}; train consumption {TRAIN_RATE:.0f} img/s/chip")
    with tempfile.TemporaryDirectory() as root:
        for q in (90, 95):
            paths = make_jpegs(os.path.join(root, str(q)), n, q)
            kb = np.mean([os.path.getsize(p) for p in paths]) / 1024
            rows = {}
            for mode, env in [("native", {}), ("pil", {"TRIS_NATIVE_DECODE": "0"}),
                              ("native+fast", {"TRIS_FAST_DECODE": "1"})]:
                old = {k: os.environ.get(k) for k in
                       ("TRIS_NATIVE_DECODE", "TRIS_FAST_DECODE")}
                os.environ.pop("TRIS_NATIVE_DECODE", None)
                os.environ.pop("TRIS_FAST_DECODE", None)
                os.environ.update(env)
                rows[mode] = rate(paths)
                for k, v in old.items():
                    os.environ.pop(k, None)
                    if v is not None:
                        os.environ[k] = v
            print(f"\nq{q} (~{kb:.0f} KB): " + "  ".join(
                f"{m} {r:.0f} img/s/core" for m, r in rows.items()))
            r = rows["native"]
            print(f"  cores/chip {TRAIN_RATE / r:.1f}  |  8-chip host needs "
                  f"{8 * TRAIN_RATE / r:.0f} cores (exact native decode)")

        paths = make_jpegs(os.path.join(root, "ldr"), n, 95, seed=1)
        print("\nLoader threaded pipeline (q95, bs 48):")
        for t in (1, 2, 4, 8):
            print(f"  threads={t}: {loader_rate(paths, t):.0f} img/s aggregate")


if __name__ == "__main__":
    main()
