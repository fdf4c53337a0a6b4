"""Host-side throughput of the IRNet affinity-training loader (VERDICT r3
weak #3): is the IRN train step host- or device-bound?

The loader (pseudo/pipeline.py::irn_train_batches) builds each batch with a
PIL chain per example — decode, rescale(0.5-1.5), normalize, hflip, crop 512,
quarter-scale label reduce, affinity-label extraction over the radius-10
PathIndex. This script synthesizes a realistic on-disk dataset (COCO-sized
JPEGs + ir_label PNGs), then measures batches/sec at several thread counts.
Compare against the DEVICE step rate from `TRIS_BENCH_MODE=irntrain
python bench.py` (images/sec/chip): the loader must produce >= that rate or
the step starves.

Run: python tools/irn_feed_experiments.py [n_images] [threads ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def make_dataset(root: str, n: int, seed: int = 0):
    """n synthetic COCO-train2014-style JPEGs (~580x480, the COCO mean) with
    matching quarter-scale-able ir_label PNGs ({0, 1, 255} maps)."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "train2014")
    lab_dir = os.path.join(root, "ir_label")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)
    names = []
    for i in range(n):
        h, w = int(rng.integers(400, 560)), int(rng.integers(500, 640))
        # low-frequency content: JPEG size/decode cost like a natural photo
        small = rng.integers(0, 255, (h // 8, w // 8, 3), np.uint8)
        img = np.asarray(Image.fromarray(small).resize((w, h), Image.BILINEAR))
        name = f"x_y_{i:06d}"
        Image.fromarray(img).save(
            os.path.join(img_dir, f"COCO_train2014_{i:012d}.jpg"), quality=90)
        lab = rng.choice(np.array([0, 1, 255], np.uint8), (h, w), p=[0.45, 0.35, 0.2])
        Image.fromarray(lab).save(os.path.join(lab_dir, name + ".png"))
        names.append(name)
    return names, img_dir, lab_dir


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    threads = [int(t) for t in sys.argv[2:]] or [1, 4, 8]
    batch_size = int(os.environ.get("TRIS_IRN_BATCH", 24))
    labels = os.environ.get("TRIS_IRN_LABELS", "device")  # 'device' | 'host'

    import tempfile

    from tris_tpu.pseudo.indexing import PathIndex
    from tris_tpu.pseudo.pipeline import PseudoConfig, irn_train_batches

    with tempfile.TemporaryDirectory() as root:
        names, img_dir, lab_dir = make_dataset(root, n)
        cfg = PseudoConfig(data_root=img_dir, ir_label_dir=lab_dir, crop_size=512)
        pi = PathIndex(cfg.radius, (cfg.crop_size // 4, cfg.crop_size // 4))

        print(f"labels={labels} (TRIS_IRN_LABELS)")
        for nt in threads:
            gen = irn_train_batches(cfg, names, pi, batch_size, epochs=1,
                                    num_threads=nt, labels=labels)
            b0 = next(gen)  # warm: thread spin-up + first batch
            t0 = time.perf_counter()
            nb = 0
            for b in gen:
                assert b["image"].shape[1] == cfg.crop_size
                nb += 1
            dt = time.perf_counter() - t0
            rate = nb * batch_size / dt if nb else float("nan")
            print(f"threads={nt}: {nb} batches of {batch_size} in {dt:.2f}s "
                  f"-> {rate:.1f} img/s host-side "
                  f"({rate and batch_size / rate * 1e3:.0f} ms/batch)")
        del b0


if __name__ == "__main__":
    main()
