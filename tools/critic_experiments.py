"""Round-3 TPU roofline + optimization experiments for the frozen ViT-B/32
critic block (VERDICT r2 next #1).

The critic is +33 ms of the 102 ms stage-1 train step (PERF_NOTES round-2
breakdown) and dominates PRMS; the trunk got a per-stage roofline, the critic
got only a total. Each experiment here times one isolated jitted piece on the
real TPU (bf16, B=48 unless noted) with the device-resident-checksum
methodology bench.py uses (relay-safe).

Run: python tools/critic_experiments.py [exp names...]
Findings land in docs/PERF_NOTES.md.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tris_tpu.models.clip import CLIP, CLIP_CONFIGS

B = 48
SIZE = 320
CRITIC_RES = 224


def _critic(layers=None):
    cfg = dataclasses.replace(CLIP_CONFIGS["ViT-B-32"], txt_length=20)
    if layers is not None:
        cfg = dataclasses.replace(cfg, vision_layers=layers)
    return CLIP(cfg, dtype=jnp.bfloat16)


def _ids(n):
    ids = np.zeros((n, 20), np.int32)
    ids[:, 0], ids[:, 1], ids[:, 2] = 49406, 786, 49407
    return jnp.asarray(ids)


def _time(fn, inputs, iters=100, warmup=2):
    """fn(x) -> scalar-reducible array; inputs: list of device-resident args."""

    @jax.jit
    def chk(acc, out):
        return acc + out.astype(jnp.float32).mean()

    acc = jnp.zeros((), jnp.float32)
    for i in range(warmup):
        acc = chk(acc, fn(inputs[i % len(inputs)]))
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for i in range(iters):
        acc = chk(acc, fn(inputs[i % len(inputs)]))
    float(acc)
    return (time.perf_counter() - t0) / iters * 1000  # ms/iter


def _images(n, b=B, size=CRITIC_RES, dtype=jnp.bfloat16):
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    imgs = [jax.random.normal(k, (b, size, size, 3), dtype) for k in keys]
    jax.block_until_ready(imgs)
    return imgs


def exp_img_fwd():
    """Critic encode_image forward, [48, 224, 224, 3] bf16."""
    critic = _critic()
    v = jax.jit(lambda k: critic.init(k, jnp.zeros((1, 224, 224, 3)), _ids(1)))(jax.random.PRNGKey(0))
    fwd = jax.jit(lambda vv, img: critic.apply(vv, img, method="encode_image"))
    ms = _time(lambda img: fwd(v, img), _images(4))
    # ViT-B/32 fwd ~4.4 GFLOP/img
    print(f"img_fwd: {ms:.3f} ms/batch  ({B * 4.4 / ms:.0f} GFLOP/ms -> {B * 4.4 / ms:.1f} TFLOP/s)")


def exp_img_fwd_bwd():
    """Critic encode_image fwd + bwd-through-activations (what l1 pays)."""
    critic = _critic()
    v = jax.jit(lambda k: critic.init(k, jnp.zeros((1, 224, 224, 3)), _ids(1)))(jax.random.PRNGKey(0))

    @jax.jit
    def fwdbwd(vv, img):
        y, vjp = jax.vjp(lambda im: critic.apply(vv, im, method="encode_image"), img)
        (g,) = vjp(jnp.ones_like(y))
        return y.astype(jnp.float32).mean() + g.astype(jnp.float32).mean()

    ms = _time(lambda img: fwdbwd(v, img), _images(4))
    print(f"img_fwd_bwd: {ms:.3f} ms/batch  (~{B * 13.2 / ms:.1f} TFLOP/s at 3x fwd FLOPs)")


def exp_vit_prefix():
    """Forward time vs number of transformer blocks (0, 3, 6, 9, 12): isolates
    patch-embed/LN overhead from the per-block cost."""
    for L in [0, 3, 6, 9, 12]:
        critic = _critic(layers=max(L, 1))
        if L == 0:
            # patch embed only: conv + concat + pos + ln_pre via a 1-layer
            # model's visual module is awkward; approximate with 1 layer and
            # subtract later. Report L=1 instead.
            continue
        v = jax.jit(lambda k, c=critic: c.init(k, jnp.zeros((1, 224, 224, 3)), _ids(1)))(jax.random.PRNGKey(0))
        fwd = jax.jit(lambda vv, img, c=critic: c.apply(vv, img, method="encode_image"))
        ms = _time(lambda img, vv=v, f=fwd: f(vv, img), _images(4))
        print(f"vit_prefix L={L}: {ms:.3f} ms/batch")


def exp_text_batching():
    """Text tower cost: separate pos [48] + neg [144] encodes vs one fused
    [192] encode (the l1/l5 batching lever)."""
    critic = _critic()
    v = jax.jit(lambda k: critic.init(k, jnp.zeros((1, 224, 224, 3)), _ids(1)))(jax.random.PRNGKey(0))

    ids48 = [_ids(48) for _ in range(2)]
    ids144 = [_ids(144) for _ in range(2)]
    ids192 = [_ids(192) for _ in range(2)]
    enc = jax.jit(lambda vv, ids: critic.apply(vv, ids, method="encode_text")[1])

    t48 = _time(lambda ids: enc(v, ids), ids48)
    t144 = _time(lambda ids: enc(v, ids), ids144)
    t192 = _time(lambda ids: enc(v, ids), ids192)
    print(f"text: [48] {t48:.3f} ms, [144] {t144:.3f} ms, [192] {t192:.3f} ms; "
          f"split {t48 + t144:.3f} vs fused {t192:.3f}")


def exp_resize_modulate():
    """The 224px cam-modulation: resize(sig_map 320->224) * resize(img) fwd+bwd
    wrt sig_map, f32 image vs bf16 — the l1 input prep."""
    from tris_tpu.ops.resize import bilinear_resize

    def prep(sig, img):
        def to224(x):
            y = x.transpose(0, 3, 1, 2)
            y = bilinear_resize(y, (224, 224), align_corners=True)
            return y.transpose(0, 2, 3, 1)

        return to224(sig) * to224(img)

    key = jax.random.PRNGKey(0)
    sigs = [jax.random.uniform(k, (B, SIZE, SIZE, 1), jnp.bfloat16)
            for k in jax.random.split(key, 2)]
    img32 = jax.random.normal(key, (B, SIZE, SIZE, 3), jnp.float32)
    img16 = img32.astype(jnp.bfloat16)
    jax.block_until_ready([img32, img16])

    for name, img in [("img_f32", img32), ("img_bf16", img16)]:
        @jax.jit
        def fwdbwd(sig, img=img):
            y, vjp = jax.vjp(lambda s: prep(s, img), sig)
            (g,) = vjp(jnp.ones_like(y))
            return y.astype(jnp.float32).mean() + g.astype(jnp.float32).mean()

        ms = _time(fwdbwd, sigs)
        print(f"resize_modulate fwd+bwd ({name}): {ms:.3f} ms/batch")


def exp_patch_embed():
    """ViT patch embed: nn.Conv (3 input channels -> 3/128 MXU lanes) vs the
    equivalent space-to-depth + [N*49, 3072] @ [3072, 768] matmul (stride ==
    patch makes the im2col a pure reshape/transpose)."""
    ps, W = 32, 768
    key = jax.random.PRNGKey(0)
    kernel = jax.random.normal(key, (ps, ps, 3, W), jnp.bfloat16) * 0.02
    imgs = _images(2)

    # one un-jitted definition of each form, shared by the fwd and fwd+bwd
    # timings so the A/B can't drift between two copies
    def _conv(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (ps, ps), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def _mm(x):
        N, H, Wd, C = x.shape
        gh, gw = H // ps, Wd // ps
        p = x.reshape(N, gh, ps, gw, ps, C).transpose(0, 1, 3, 2, 4, 5)
        p = p.reshape(N, gh * gw, ps * ps * C)
        return p @ kernel.reshape(ps * ps * C, W)

    conv_embed = jax.jit(_conv)
    matmul_embed = jax.jit(_mm)

    np.testing.assert_allclose(
        np.asarray(conv_embed(imgs[0]), np.float32).reshape(B, -1, W),
        np.asarray(matmul_embed(imgs[0]), np.float32), rtol=2e-2, atol=2e-2)
    t_conv = _time(conv_embed, imgs)
    t_mm = _time(matmul_embed, imgs)
    print(f"patch_embed fwd: conv {t_conv:.3f} ms vs im2col-matmul {t_mm:.3f} ms")

    # the BWD-wrt-input is where a conv hurts: the input gradient of a
    # 3-in-channel conv is a transposed conv with 3 OUTPUT channels (3/128
    # lanes on the MXU); the matmul form backprops as a [N*49, 768] @
    # [768, 3072] matmul + reshape
    def mk_fwdbwd(f):
        @jax.jit
        def fwdbwd(x):
            y, vjp = jax.vjp(f, x)
            (g,) = vjp(jnp.ones_like(y))
            return y.astype(jnp.float32).mean() + g.astype(jnp.float32).mean()
        return fwdbwd

    tb_conv = _time(mk_fwdbwd(_conv), imgs)
    tb_mm = _time(mk_fwdbwd(_mm), imgs)
    print(f"patch_embed fwd+bwd-wrt-input: conv {tb_conv:.3f} ms vs im2col-matmul {tb_mm:.3f} ms")


def exp_block_pieces():
    """One ViT block's fwd and fwd+bwd at [48, 50, 768] bf16, split into
    attn / mlp / layernorm — finds where the 5.5x bwd overhead lives."""
    import functools

    from tris_tpu.models.layers import quick_gelu

    N, L, C, H = B, 50, 768, 12
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    xw = 0.02
    Wqkv = jax.random.normal(ks[0], (C, 3 * C), jnp.bfloat16) * xw
    bqkv = jnp.zeros((3 * C,), jnp.bfloat16)
    Wo = jax.random.normal(ks[1], (C, C), jnp.bfloat16) * xw
    W1 = jax.random.normal(ks[2], (C, 4 * C), jnp.bfloat16) * xw
    W2 = jax.random.normal(ks[3], (4 * C, C), jnp.bfloat16) * xw
    g = jnp.ones((C,), jnp.float32)
    bt = jnp.zeros((C,), jnp.float32)
    xs = [jax.random.normal(k, (N, L, C), jnp.bfloat16) for k in ks[4:6]]
    jax.block_until_ready(xs)

    def ln32(x):
        y = x.astype(jnp.float32)
        mu = y.mean(-1, keepdims=True)
        var = ((y - mu) ** 2).mean(-1, keepdims=True)
        return ((y - mu) / jnp.sqrt(var + 1e-5) * g + bt).astype(x.dtype)

    def ln16(x):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-5) * g.astype(x.dtype) + bt.astype(x.dtype)

    def attn(x):
        qkv = x @ Wqkv + bqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = C // H
        qh = q.reshape(N, L, H, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(N, L, H, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(N, L, H, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("nhqd,nhkd->nhqk", qh * (hd ** -0.5), kh)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("nhqk,nhkd->nhqd", w, vh)
        return out.transpose(0, 2, 1, 3).reshape(N, L, C) @ Wo

    def mlp(x):
        return quick_gelu(x @ W1) @ W2

    def block(x, ln):
        x = x + attn(ln(x))
        return x + mlp(ln(x))

    def timed(name, f):
        fj = jax.jit(f)
        t_f = _time(fj, xs)

        @jax.jit
        def fb(x):
            y, vjp = jax.vjp(f, x)
            (gx,) = vjp(jnp.ones_like(y))
            return y.astype(jnp.float32).mean() + gx.astype(jnp.float32).mean()

        t_fb = _time(fb, xs)
        print(f"{name}: fwd {t_f:.3f} ms, fwd+bwd {t_fb:.3f} ms (x12 = {12 * t_fb:.1f} ms)")

    timed("attn", attn)
    timed("mlp", mlp)
    timed("ln_f32", ln32)
    timed("ln_bf16", ln16)
    timed("block(ln_f32)", functools.partial(block, ln=ln32))
    timed("block(ln_bf16)", functools.partial(block, ln=ln16))


def exp_prms_batch():
    """PRMS fused program at several ref-batch sizes (relay-amortized)."""
    from tris_tpu.eval.validate import make_prms_forward
    from tris_tpu.models.stage1 import Stage1Config, TRISStage1

    model = TRISStage1(Stage1Config(), dtype=jnp.bfloat16)
    critic = _critic()
    key = jax.random.PRNGKey(0)
    for batch in [16, 32, 64]:
        image = jax.random.normal(key, (batch, SIZE, SIZE, 3), jnp.float32)
        ids = np.zeros((batch, 4, 20), np.int32)
        ids[..., 0], ids[..., 1], ids[..., 2] = 49406, 786, 49407
        ids = jnp.asarray(ids)
        valid = jnp.ones((batch, 4), bool)
        variables = jax.jit(lambda k: model.init(k, image, ids[:, 0], train=False))(key)
        critic_vars = jax.jit(lambda k: critic.init(k, jnp.zeros((1, 224, 224, 3)), ids[:1, 0]))(key)
        fwd = make_prms_forward(model, critic)
        best, cams, scores = fwd(variables, critic_vars, image, ids, valid)
        float(scores.sum())
        t0 = time.perf_counter()
        iters = 100
        acc = jnp.zeros(())
        for _ in range(iters):
            best, cams, scores = fwd(variables, critic_vars, image, ids, valid)
            acc = acc + scores.sum()
        float(acc)
        dt = time.perf_counter() - t0
        print(f"prms B={batch}: {batch * iters / dt:.0f} refs/s/chip ({dt / iters * 1000:.2f} ms/batch)")


def exp_train_pieces():
    """Decompose the full train step: model-only (w1=w5=0 still runs critic img
    for l5 -> use negatives=None and w1=0), +l1, +l5."""
    from tris_tpu.models.stage1 import Stage1Config, TRISStage1
    from tris_tpu.train.stage1 import Stage1LossWeights, make_train_step
    from tris_tpu.train.state import create_train_state

    model = TRISStage1(Stage1Config(), dtype=jnp.bfloat16)
    critic = _critic()
    img = jnp.zeros((B, SIZE, SIZE, 3), jnp.float32)
    ids = _ids(B)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k: model.init(k, img, ids, train=True))(key)
    critic_vars = jax.jit(lambda k: critic.init(k, jnp.zeros((1, 224, 224, 3)), ids[:1]))(key)

    def run(weights, with_negs, label, iters=30):
        # fresh copies: the donated train step consumes the state's buffers,
        # and create_train_state aliases the passed-in variables
        vcopy = jax.tree_util.tree_map(jnp.copy, variables)
        state = create_train_state(model, vcopy, total_steps=10 ** 6)
        step = make_train_step(model, critic, weights, donate=True)
        bt = {
            "image": jax.random.normal(key, (B, SIZE, SIZE, 3), jnp.float32),
            "word_ids": ids,
        }
        if with_negs:
            bt["neg_word_ids"] = jnp.broadcast_to(ids[:, None], (B, 3, 20))
        state, m = step(state, bt, critic_vars)
        float(m["loss"])
        state, m = step(state, bt, critic_vars)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, bt, critic_vars)
        float(m["loss"])
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"train[{label}]: {ms:.2f} ms/step ({B / ms * 1000:.0f} img/s/chip)")
        return ms

    run(Stage1LossWeights(w1=0.0, w4=5.0, w5=0.0), False, "l4 only (no critic)")
    run(Stage1LossWeights(w1=1.0, w4=5.0, w5=0.0), False, "l1+l4 (critic img fwd+bwd)")
    run(Stage1LossWeights(w1=1.0, w4=5.0, w5=2.0), True, "full l1+l4+l5")


def exp_seq_pad():
    """VERDICT r3 weak #6: is the PRMS critic's ~51% MXU the L=50 attention
    padding? Time the 12-block ViT body forward at L in {50, 56, 64} (same
    width/heads; extra tokens are pure padding) at PRMS-critic scale
    (256 concurrent 224px images = B64 x S4 scorings). If a padded L runs
    FASTER in absolute terms, wire masked padding into VisionTransformer;
    if each L costs proportionally more, the padding hypothesis is wrong and
    the ceiling is elsewhere."""
    from tris_tpu.models.layers import ResidualAttentionBlock

    C, H, NB = 768, 12, 12
    for N in (48, 256):
        base = None
        for L in (50, 56, 64):
            class Body(__import__("flax").linen.Module):
                @__import__("flax").linen.compact
                def __call__(self, x):
                    for i in range(NB):
                        x = ResidualAttentionBlock(C, H, jnp.bfloat16, name=f"b{i}")(x)
                    return x[:, 0]

            body = Body()
            key = jax.random.PRNGKey(0)
            v = jax.jit(lambda k, b=body, l=L: b.init(k, jnp.zeros((1, l, C), jnp.bfloat16)))(key)
            fwd = jax.jit(lambda vv, x, b=body: b.apply(vv, x))
            xs = [jax.random.normal(k, (N, L, C), jnp.bfloat16)
                  for k in jax.random.split(key, 2)]
            jax.block_until_ready(xs)
            ms = _time(lambda x, vv=v, f=fwd: f(vv, x), xs, iters=50)
            base = base or ms
            print(f"seq_pad N={N} L={L}: {ms:.3f} ms/batch  ({ms / base:.3f}x vs L=50)")


def exp_attnpool_text():
    """VERDICT r3 weak #6, second part: roofline the two eval-forward blocks
    that had none — RN50 attnpool (full HW+1 self-attention at 10x10 for
    320px) and the RN50 text tower ([N, 20] -> 12 x 512-wide blocks) — at
    eval-shape batches, with FLOP counts, so PERF_NOTES can state measured
    TFLOP/s instead of assertions."""
    from tris_tpu.models.layers import AttentionPool2d, ResidualAttentionBlock, causal_mask

    # attnpool at eval: B=128 refs share the trunk, [128, 10, 10, 2048]
    N, Hs, Ws, C, out = 128, 10, 10, 2048, 1024
    pool = AttentionPool2d(spacial_dim=7, embed_dim=C, num_heads=32,
                           output_dim=out, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    v = jax.jit(lambda k: pool.init(k, jnp.zeros((1, Hs, Ws, C), jnp.bfloat16)))(key)
    fwd = jax.jit(lambda vv, x: pool.apply(vv, x)[1])
    xs = [jax.random.normal(k, (N, Hs, Ws, C), jnp.bfloat16) for k in jax.random.split(key, 2)]
    jax.block_until_ready(xs)
    ms = _time(lambda x: fwd(v, x), xs, iters=50)
    L = Hs * Ws + 1
    # qkv+out projections: 4 * L*C*C*2; q/k/v use embed C; out proj C->out
    flops = N * (3 * L * C * C * 2 + L * C * out * 2 + 2 * L * L * C * 2)
    print(f"attnpool [128,10,10,2048]: {ms:.3f} ms  ({flops / ms / 1e9:.1f} TFLOP/s)")

    # text tower at eval: S=4 sentences x 128 refs = 512 sequences of L=20,
    # 512-wide 8-head 12 blocks + embed/ln/proj (proj negligible)
    Nt, Lt, Ct, NB = 512, 20, 512, 12

    class Text(__import__("flax").linen.Module):
        @__import__("flax").linen.compact
        def __call__(self, x, mask):
            for i in range(NB):
                x = ResidualAttentionBlock(Ct, 8, jnp.bfloat16, name=f"b{i}")(x, mask)
            return x

    txt = Text()
    mask = causal_mask(Lt, jnp.bfloat16)
    vt = jax.jit(lambda k: txt.init(k, jnp.zeros((1, Lt, Ct), jnp.bfloat16), mask))(key)
    fwdt = jax.jit(lambda vv, x: txt.apply(vv, x, mask))
    xts = [jax.random.normal(k, (Nt, Lt, Ct), jnp.bfloat16) for k in jax.random.split(key, 2)]
    jax.block_until_ready(xts)
    mst = _time(lambda x: fwdt(vt, x), xts, iters=50)
    flops_t = Nt * NB * (4 * Lt * Ct * Ct * 2 + 2 * Lt * Ct * 4 * Ct * 2 + 2 * Lt * Lt * Ct * 2)
    # weight-read floor: 12 blocks x ~12*C^2 params in bf16
    wbytes = NB * 12 * Ct * Ct * 2
    print(f"text tower [512,20,512]: {mst:.3f} ms  ({flops_t / mst / 1e9:.1f} TFLOP/s; "
          f"weight-read floor at 819 GB/s = {wbytes / 819e9 * 1e3:.3f} ms)")


EXPS = {
    "img_fwd": exp_img_fwd,
    "seq_pad": exp_seq_pad,
    "attnpool_text": exp_attnpool_text,
    "img_fwd_bwd": exp_img_fwd_bwd,
    "vit_prefix": exp_vit_prefix,
    "text_batching": exp_text_batching,
    "resize_modulate": exp_resize_modulate,
    "patch_embed": exp_patch_embed,
    "block_pieces": exp_block_pieces,
    "prms_batch": exp_prms_batch,
    "train_pieces": exp_train_pieces,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(EXPS)
    for n in names:
        print(f"--- {n} ---", flush=True)
        EXPS[n]()
