"""Batched evaluation: standard validate + PRMS response-map selection.

Re-design of `/root/reference/validate.py:131-387` for TPU:

- The reference runs batch-1, one model forward per sentence in a Python loop
  (validate.py:173-179). Here all padded sentences of a batch of refs go
  through ONE jitted forward of shape ``[B*S, ...]`` — static shapes, big
  MXU batches.
- PRMS (validate.py:253-387): for each ref, every sentence's response map
  modulates the 224px image; a frozen ViT-B/32 critic scores each modulated
  image against ALL sentences; the map whose summed score is highest wins.
  The reference runs S model forwards + S^2 critic calls per ref; here it is
  one fused jit program per ref batch (the S x S score matrix is a single
  matmul).
- Final per-ref metrics (upsample to the ORIGINAL size, max-normalize,
  threshold > 1e-9, IoU/hit/boxes — validate.py:180-208) run on host in
  numpy, exactly as the reference semantics demand (variable original sizes).

Outputs for the IRNet stage keep the reference's file contract:
``{cam_save_dir}/{idx}_{img_id}.npy`` + ``{dataset}_train_names.json``
(validate.py:354-378).
"""

from __future__ import annotations

import functools
import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tris_tpu.eval.metrics import SegEvalAccumulator
from tris_tpu.ops.resize import _resize_matrix_np


def _host_pool(host_threads: int) -> Optional[ThreadPoolExecutor]:
    """Thread pool for per-ref host metric work (the resize matmuls release
    the GIL inside BLAS). host_threads=0 -> cpu_count; 1 -> run inline."""
    n = os.cpu_count() or 1 if host_threads == 0 else host_threads
    return ThreadPoolExecutor(max_workers=n) if n > 1 else None


def _map_jobs(pool: Optional[ThreadPoolExecutor], fn, jobs):
    return list(pool.map(fn, jobs)) if pool is not None else [fn(j) for j in jobs]


def resize_to_original_np(cam: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Host bilinear resize (align_corners=True, validate.py:180) via cached
    interpolation matrices; cam: [h, w] -> [oh, ow]."""
    ah = _resize_matrix_np(cam.shape[0], oh, True)
    aw = _resize_matrix_np(cam.shape[1], ow, True)
    return ah @ cam.astype(np.float32) @ aw.T


def normalize_threshold(cam: np.ndarray):
    """Max-normalize then threshold (validate.py:183-186). Returns (cam_norm, pred)."""
    cam = cam / (cam.max() + 1e-5)
    return cam, cam > 1e-9


# ---- device-side original-size resize + normalize --------------------------
#
# The reference's eval protocol resizes every response map to the ORIGINAL
# image size and max-normalizes there (validate.py:180-186). Host numpy
# matmuls for that cost ~300 MFLOP per sentence at COCO sizes and dominate
# end-to-end eval wall-clock on few-core hosts; the same matmuls are
# microseconds on the MXU. Each image's torch-exact interpolation matrices
# (rows beyond its own (oh, ow) zeroed) are built on host and batched into
# one einsum, so results are bit-comparable with resize_to_original_np.


# Each cached matrix is [max_out, in] f32 — ~0.8 MB at COCO sizes (640x320).
# COCO-family splits have few distinct original sizes so 256 entries never
# evict; a dataset with thousands of distinct sizes can bound host+HBM cache
# memory with TRIS_RESIZE_MAT_CACHE (entries per cache, host and device each).
# The env var is read at first USE (not import) so setting it after importing
# tris_tpu still takes effect.
def _mat_cache_size() -> int:
    return int(os.environ.get("TRIS_RESIZE_MAT_CACHE", "256"))


_padded_resize_matrix_impl = None


def _padded_resize_matrix(in_size: int, out_size: int, max_out: int) -> np.ndarray:
    global _padded_resize_matrix_impl
    if _padded_resize_matrix_impl is None:
        @functools.lru_cache(maxsize=_mat_cache_size())
        def impl(in_size: int, out_size: int, max_out: int) -> np.ndarray:
            A = np.zeros((max_out, in_size), np.float32)
            A[:out_size] = _resize_matrix_np(in_size, out_size, True)
            return A

        _padded_resize_matrix_impl = impl
    return _padded_resize_matrix_impl(in_size, out_size, max_out)


def _resize_norm_valid(cams, Ah, Aw):
    """Shared core: resize each [B, S, h, w] map with its image's padded
    matrices and max-normalize over the valid region. Returns
    (normalized [B, S, maxH, maxW] f32, valid [B, 1, maxH, maxW] bool)."""
    out = jnp.einsum(
        "bHh,bshw,bWw->bsHW",
        Ah, cams.astype(jnp.float32), Aw,
        precision=jax.lax.Precision.HIGHEST,
    )
    valid = (Ah.sum(-1) > 0)[:, None, :, None] & (Aw.sum(-1) > 0)[:, None, None, :]
    m = jnp.where(valid, out, -jnp.inf).max(axis=(-2, -1), keepdims=True)
    return out / (m + 1e-5), valid


@jax.jit
def _device_resize_norm(cams, Ah, Aw):
    """cams [B, S, h, w] (any float dtype), Ah [B, maxH, h], Aw [B, maxW, w]
    -> max-normalized maps [B, S, maxH, maxW] f32; rows/cols beyond each
    image's own size are zero and excluded from the max."""
    return _resize_norm_valid(cams, Ah, Aw)[0]


def _metrics_core(norm, valid, targets, bboxes):
    """Per-map metric scalars, identical to the host chain
    (compute_mask_iu + is_correct_hit on the sliced original-size map).

    norm [B, S, maxH, maxW] normalized maps, valid [B, 1, maxH, maxW],
    targets [B, maxH, maxW] (gt zero-padded), bboxes [B, 4] x1y1x2y2.
    Returns (I, U, hit, hitm), each [B, S] f32.

    Padding cells have norm == 0 exactly, so `pred = norm > 1e-9` is False
    there and I/U over the padded plane equal the sliced sums. The peak
    argmax masks padding to -inf; row-major first-tie order restricted to
    valid cells matches numpy's argmax over the sliced array.
    """
    B, S, maxh, maxw = norm.shape
    pred = norm > 1e-9
    tgt = targets.astype(bool)[:, None]                      # [B, 1, maxH, maxW]
    I = jnp.sum(pred & tgt, axis=(-2, -1)).astype(jnp.float32)
    U = jnp.sum(pred | tgt, axis=(-2, -1)).astype(jnp.float32)

    flat = jnp.where(valid, norm, -jnp.inf).reshape(B, S, maxh * maxw)
    peak = jnp.argmax(flat, axis=-1)                         # [B, S]
    py = (peak // maxw).astype(jnp.float32)
    px = (peak % maxw).astype(jnp.float32)
    tflat = targets.reshape(B, 1, maxh * maxw)
    hitm = jnp.take_along_axis(
        jnp.broadcast_to(tflat, (B, S, maxh * maxw)), peak[..., None], axis=-1
    )[..., 0].astype(jnp.float32)
    x1, y1, x2, y2 = (bboxes[:, i:i + 1].astype(jnp.float32) for i in range(4))
    hit = ((x1 <= px) & (px <= x2) & (y1 <= py) & (py <= y2)).astype(jnp.float32)
    return I, U, hit, hitm


@jax.jit
def _device_metrics(cams, Ah, Aw, targets, bboxes):
    """Eval-path metrics fully on device: only [B, S] scalars leave the chip."""
    norm, valid = _resize_norm_valid(cams, Ah, Aw)
    return _metrics_core(norm, valid, targets, bboxes)


def _make_mats_fn(put, mesh):
    """Batch -> (Ah, Aw) device interpolation-matrix stacks.

    Original sizes repeat heavily (most of COCO is 640x480/480x640), so the
    single-device path caches each image's padded matrix ON DEVICE and stacks
    resident arrays — no per-batch rebuild or host->device re-upload. The
    mesh path keeps the host build + sharded upload (stacking replicated
    device arrays would then need a resharding pass anyway)."""
    if mesh is not None:
        def mats(batch, h, w, maxh, maxw):
            Ah = np.stack([_padded_resize_matrix(h, t.shape[0], maxh) for t in batch["target"]])
            Aw = np.stack([_padded_resize_matrix(w, t.shape[1], maxw) for t in batch["target"]])
            return put(Ah), put(Aw)
        return mats

    @functools.lru_cache(maxsize=_mat_cache_size())
    def dev_mat(in_size: int, out_size: int, max_out: int):
        return jnp.asarray(_padded_resize_matrix(in_size, out_size, max_out))

    def mats(batch, h, w, maxh, maxw):
        Ah = jnp.stack([dev_mat(h, t.shape[0], maxh) for t in batch["target"]])
        Aw = jnp.stack([dev_mat(w, t.shape[1], maxw) for t in batch["target"]])
        return Ah, Aw

    return mats


def _padded_targets_boxes(batch, maxh: int, maxw: int):
    B = len(batch["target"])
    tgt = np.zeros((B, maxh, maxw), np.uint8)
    for b, t in enumerate(batch["target"]):
        tgt[b, : t.shape[0], : t.shape[1]] = t
    flat = [np.asarray(bb, np.float32).reshape(-1) for bb in batch["bbox"]]
    for bb in flat:
        # the host chain's is_correct_hit accepts a [K, 4] box stack and hits
        # on ANY box; _metrics_core only handles one. Fail loudly rather than
        # silently undercount hit on a multi-box dataset.
        if bb.size != 4:
            raise ValueError(
                f"device-metrics path supports exactly one gt box per ref, got "
                f"{bb.size // 4}; rerun with --no_device_resize for multi-box data"
            )
    boxes = np.stack(flat)
    return tgt, boxes


def _make_input_fn(mesh):
    """Host array -> device array placement. With a mesh, every input's
    leading (batch) dim is sharded over the 'data' axis so the jitted eval
    programs run data-parallel across the mesh's chips (GSPMD partitions the
    forward, the resize einsum, and the metric reductions alike); without
    one, plain transfers."""
    if mesh is None:
        return jnp.asarray
    from tris_tpu.parallel.mesh import make_put

    return make_put(mesh)


@jax.jit
def _gather_metrics_norm(cams, best, Ah, Aw, targets, bboxes):
    """PRMS path: select best map, metrics on device; also return the
    normalized best maps (fetched only when CAMs are being dumped)."""
    sel = jnp.take_along_axis(cams, best[:, None, None, None], axis=1)
    norm, valid = _resize_norm_valid(sel, Ah, Aw)
    I, U, hit, hitm = _metrics_core(norm, valid, targets, bboxes)
    return (I[:, 0], U[:, 0], hit[:, 0], hitm[:, 0]), norm[:, 0]


def make_eval_forward(model):
    """Jitted multi-sentence eval forward.

    (variables, image [B,H,W,3], word_ids [B,S,L]) -> relu CAMs [B, S, H, W]

    Uses ``TRISStage1.response_maps``: the vision trunk runs once per image
    (shared across its S sentences), and each pair's fusion sees only its own
    text — the reference's batch-1 eval semantics (validate.py:173-179).
    """

    @jax.jit
    def forward(variables, image, word_ids):
        from tris_tpu.ops.normalize import image_input_to_f32

        return model.apply(variables, image_input_to_f32(image), word_ids,
                           method="response_maps")

    return forward


def make_prms_forward(model, critic):
    """Jitted PRMS step for one ref batch.

    (variables, critic_vars, image [B,H,W,3], word_ids [B,S,L], valid [B,S])
      -> (best_idx [B], cams [B,S,H,W], scores [B,S])

    score_j = sum_i cos(critic_img(cam_j * img_224), critic_txt(sent_i))
    over valid sentences i (validate.py:311-334).
    """
    critic_size = critic.config.image_resolution

    @jax.jit
    def forward(variables, critic_vars, image, word_ids, valid):
        from tris_tpu.ops.normalize import image_input_to_f32
        from tris_tpu.ops.resize import bilinear_resize

        image = image_input_to_f32(image)  # u8 feed (TRIS_U8_FEED)
        B, S, L = word_ids.shape
        H, W = image.shape[1], image.shape[2]
        flat_ids = word_ids.reshape(B * S, L)
        # trunk shared across the S sentences; per-pair fusion semantics
        cams_bshw = model.apply(variables, image, word_ids, method="response_maps")

        # 224px modulated foreground images (align_corners=True, validate.py:304,318-324)
        def to224(x_nchw):
            return bilinear_resize(x_nchw, (critic_size, critic_size), align_corners=True)

        img224 = to224(image.transpose(0, 3, 1, 2))                     # [B, 3, 224, 224]
        cam224 = to224(cams_bshw.reshape(B * S, 1, H, W))
        fg = cam224[:, 0][:, None] * jnp.repeat(img224, S, axis=0)      # [B*S, 3, 224, 224]
        fg = fg.transpose(0, 2, 3, 1)                                   # NHWC

        img_feat = critic.apply(critic_vars, fg, method="encode_image")  # [B*S, C]
        _, txt_feat = critic.apply(critic_vars, flat_ids, method="encode_text")
        img_feat = img_feat / jnp.linalg.norm(img_feat, axis=-1, keepdims=True)
        txt_feat = txt_feat / jnp.linalg.norm(txt_feat, axis=-1, keepdims=True)
        fi = img_feat.reshape(B, S, -1)
        ft = txt_feat.reshape(B, S, -1)
        score_mat = jnp.einsum("bjc,bic->bji", fi, ft)                   # [B, Sj, Si]
        score_mat = jnp.where(valid[:, None, :], score_mat, 0.0)         # mask invalid i
        scores = score_mat.sum(axis=2)                                    # [B, Sj]
        scores = jnp.where(valid, scores, -jnp.inf)                       # mask invalid j
        best = jnp.argmax(scores, axis=1)
        return best, cams_bshw, scores

    return forward


def validate(
    model,
    variables,
    loader,
    with_boxes: bool = True,
    save_cam: bool = False,
    cam_save_dir: Optional[str] = None,
    name_save_dir: Optional[str] = None,
    dataset_name: str = "refcoco",
    print_freq: int = 50,
    log=print,
    host_threads: int = 0,
    device_resize: bool = True,
    mesh=None,
) -> dict:
    """Standard (non-PRMS) evaluation over an eval-mode Loader.

    ``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis — batches are
    sharded across its chips (the eval analogue of the trainers' DP mesh;
    the batch size must divide by the mesh size, which the Loader's padded
    final batch guarantees for full batches).

    The device forward for batch k+1 is dispatched (async) BEFORE batch k's
    host-side metric chain runs, so the chip computes while the host works.
    With ``device_resize`` (and a dataset exposing ``max_orig_size``), the
    original-size upsample + max-normalize also runs on device as one batched
    einsum; otherwise the host does it, fanning (ref, sentence) jobs over
    ``host_threads`` (0 = cpu_count). When no cams or box metrics are needed
    (``save_cam=False, with_boxes=False``), I/U/hit reduce on device too and
    only per-sentence scalars are fetched."""
    forward = make_eval_forward(model)
    acc = SegEvalAccumulator(with_boxes=with_boxes)
    cam_out_names = []
    max_size = getattr(getattr(loader, "ds", None), "max_orig_size", lambda: None)() if device_resize else None
    scalars_only = bool(max_size) and not save_cam and not with_boxes
    # the pool serves every non-scalars process() path: host resize matmuls
    # when not device_resize, and the cv2 box-metric pass (acc.compute) either
    # way — so gate on scalars_only, not on max_size.
    pool = None if scalars_only else _host_pool(host_threads)
    put = _make_input_fn(mesh)
    mats = _make_mats_fn(put, mesh)
    if mesh is not None:
        from tris_tpu.parallel.mesh import replicate_tree

        variables = replicate_tree(mesh, variables)
    step = 0

    def process(cams, batch):
        if scalars_only:  # cams is the (I, U, hit, hitm) scalar tuple
            I, U, hit, hitm = (np.asarray(x) for x in cams)
            for b in range(I.shape[0]):
                for j in range(int(batch["num_sents"][b])):
                    acc.add_stats(float(I[b, j]), float(U[b, j]),
                                  float(hit[b, j]), float(hitm[b, j]), weight=1)
            return
        cams = np.asarray(cams)  # blocks on this batch's device work only
        jobs = [
            (b, j)
            for b in range(cams.shape[0])
            for j in range(int(batch["num_sents"][b]))
        ]

        def one(job):
            b, j = job
            oh, ow = batch["target"][b].shape
            if max_size:  # cams are already device-normalized at padded size
                cam_norm = np.ascontiguousarray(cams[b, j, :oh, :ow])
                pred = cam_norm > 1e-9
            else:
                cam = resize_to_original_np(cams[b, j], oh, ow)
                cam_norm, pred = normalize_threshold(cam)
                cam_norm = cam_norm.astype(np.float32)
            stats = acc.compute(batch["target"][b], pred, cam_norm, batch["bbox"][b])
            return b, j, stats, cam_norm

        for b, j, stats, cam_norm in _map_jobs(pool, one, jobs):
            acc.add_computed(stats, weight=1)
            if save_cam and cam_save_dir:
                idx = int(batch["index"][b])
                img_id = int(batch["img_id"][b])
                np.save(os.path.join(cam_save_dir, f"{idx}_{j}_{img_id}.npy"), cam_norm)
                cam_out_names.append(f"{idx}_{j}_{img_id}")

    pending = None
    for batch in loader.epoch(0):
        out = forward(variables, put(batch["image"]), put(batch["word_ids"]))
        if max_size:
            h, w = batch["image"].shape[1:3]
            Ah, Aw = mats(batch, h, w, *max_size)
            if scalars_only:
                tgt, boxes = _padded_targets_boxes(batch, *max_size)
                out = _device_metrics(out, Ah, Aw, put(tgt), put(boxes))
            else:
                out = _device_resize_norm(out, Ah, Aw)
        if pending is not None:
            process(*pending)
            step += 1
            if step % print_freq == 0:
                r = acc.results()
                log(f"eval [{step}] mIoU {r['mIoU']:.3f} oIoU {r['oIoU']:.3f} hit {r['hit']:.3f}")
        pending = (out, batch)
    if pending is not None:
        process(*pending)
    if pool is not None:
        pool.shutdown()
    if save_cam and name_save_dir:
        os.makedirs(name_save_dir, exist_ok=True)
        with open(os.path.join(name_save_dir, f"{dataset_name}_train_cam_name.json"), "w") as f:
            json.dump(cam_out_names, f)
    return acc.merge_across_processes().results()


def validate_prms(
    model,
    critic,
    variables,
    critic_vars,
    loader,
    save_cam: bool = False,
    cam_save_dir: Optional[str] = None,
    name_save_dir: Optional[str] = None,
    dataset_name: str = "refcoco",
    print_freq: int = 50,
    log=print,
    host_threads: int = 0,
    device_resize: bool = True,
    mesh=None,
) -> dict:
    """PRMS evaluation + optional CAM dump feeding IRNet (validate.py:253-387).

    Pipelined like :func:`validate`: the next batch's fused PRMS program is
    dispatched before the current batch's host metric work runs. With
    ``device_resize`` the winning map's original-size upsample + normalize
    AND the I/U/hit reduction happen on device; the full-size map is only
    fetched when ``save_cam`` dumps it for IRNet."""
    forward = make_prms_forward(model, critic)
    acc = SegEvalAccumulator(with_boxes=False)
    cam_out_names = []
    if save_cam and cam_save_dir:
        os.makedirs(cam_save_dir, exist_ok=True)
    max_size = getattr(getattr(loader, "ds", None), "max_orig_size", lambda: None)() if device_resize else None
    pool = None if max_size else _host_pool(host_threads)
    put = _make_input_fn(mesh)
    mats = _make_mats_fn(put, mesh)
    if mesh is not None:
        from tris_tpu.parallel.mesh import replicate_tree

        variables = replicate_tree(mesh, variables)
        critic_vars = replicate_tree(mesh, critic_vars)
    step = 0

    def process(best, cams, stats, batch):
        jobs = [b for b in range(len(batch["target"])) if int(batch["num_sents"][b]) > 0]
        # n == 0 rows are padding of a short final batch
        if max_size:
            I, U, hit, hitm = (np.asarray(x) for x in stats)
            norm = np.asarray(cams) if save_cam else None  # fetch only if dumping
            for b in jobs:
                n = int(batch["num_sents"][b])
                acc.add_stats(float(I[b]), float(U[b]), float(hit[b]), float(hitm[b]),
                              weight=n)
                if save_cam and cam_save_dir:
                    oh, ow = batch["target"][b].shape
                    cam_norm = norm[b, :oh, :ow]
                    idx = int(batch["index"][b])
                    img_id = int(batch["img_id"][b])
                    np.save(os.path.join(cam_save_dir, f"{idx}_{img_id}.npy"), cam_norm)
                    cam_out_names.append(f"{idx}_{img_id}")
            return
        best = np.asarray(best)
        cams = np.asarray(cams)

        def one(b):
            oh, ow = batch["target"][b].shape
            cam = resize_to_original_np(cams[b, int(best[b])], oh, ow)
            cam_norm, pred = normalize_threshold(cam)
            return b, pred, cam_norm.astype(np.float32)

        for b, pred, cam_norm in _map_jobs(pool, one, jobs):
            n = int(batch["num_sents"][b])
            acc.add(batch["target"][b], pred, cam_norm, batch["bbox"][b], weight=n)
            if save_cam and cam_save_dir:
                idx = int(batch["index"][b])
                img_id = int(batch["img_id"][b])
                np.save(os.path.join(cam_save_dir, f"{idx}_{img_id}.npy"), cam_norm)
                cam_out_names.append(f"{idx}_{img_id}")

    pending = None
    for batch in loader.epoch(0):
        valid = np.arange(batch["word_ids"].shape[1])[None] < batch["num_sents"][:, None]
        best, cams, _ = forward(
            variables, critic_vars,
            put(batch["image"]), put(batch["word_ids"]), put(valid),
        )
        stats = None
        if max_size:
            h, w = batch["image"].shape[1:3]
            Ah, Aw = mats(batch, h, w, *max_size)
            tgt, boxes = _padded_targets_boxes(batch, *max_size)
            stats, cams = _gather_metrics_norm(cams, best, Ah, Aw, put(tgt), put(boxes))
        if pending is not None:
            process(*pending)
            step += 1
            if step % print_freq == 0:
                r = acc.results()
                log(f"prms [{step}] mIoU {r['mIoU']:.3f} oIoU {r['oIoU']:.3f} hit {r['hit']:.3f}")
        pending = (best, cams, stats, batch)
    if pending is not None:
        process(*pending)
    if pool is not None:
        pool.shutdown()
    if save_cam and name_save_dir:
        os.makedirs(name_save_dir, exist_ok=True)
        with open(os.path.join(name_save_dir, f"{dataset_name}_train_names.json"), "w") as f:
            json.dump(cam_out_names, f)
    return acc.merge_across_processes().results()
