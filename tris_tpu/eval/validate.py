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

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tris_tpu.eval.metrics import SegEvalAccumulator
from tris_tpu.ops.resize import _resize_matrix_np


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


def make_eval_forward(model):
    """Jitted multi-sentence eval forward.

    (variables, image [B,H,W,3], word_ids [B,S,L]) -> relu CAMs [B, S, H, W]

    Uses ``TRISStage1.response_maps``: the vision trunk runs once per image
    (shared across its S sentences), and each pair's fusion sees only its own
    text — the reference's batch-1 eval semantics (validate.py:173-179).
    """

    @jax.jit
    def forward(variables, image, word_ids):
        return model.apply(variables, image, word_ids, method="response_maps")

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
        from tris_tpu.ops.resize import bilinear_resize

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
) -> dict:
    """Standard (non-PRMS) evaluation over an eval-mode Loader."""
    forward = make_eval_forward(model)
    acc = SegEvalAccumulator(with_boxes=with_boxes)
    cam_out_names = []
    step = 0
    for batch in loader.epoch(0):
        cams = np.asarray(forward(variables, jnp.asarray(batch["image"]), jnp.asarray(batch["word_ids"])))
        B = cams.shape[0]
        for b in range(B):
            n = int(batch["num_sents"][b])
            target = batch["target"][b]
            oh, ow = target.shape
            for j in range(n):
                cam = resize_to_original_np(cams[b, j], oh, ow)
                cam_norm, pred = normalize_threshold(cam)
                acc.add(target, pred, cam_norm.astype(np.float32), batch["bbox"][b], weight=1)
                if save_cam and cam_save_dir:
                    idx = int(batch["index"][b])
                    img_id = int(batch["img_id"][b])
                    np.save(os.path.join(cam_save_dir, f"{idx}_{j}_{img_id}.npy"), cam_norm)
                    cam_out_names.append(f"{idx}_{j}_{img_id}")
        step += 1
        if step % print_freq == 0:
            r = acc.results()
            log(f"eval [{step}] mIoU {r['mIoU']:.3f} oIoU {r['oIoU']:.3f} hit {r['hit']:.3f}")
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
) -> dict:
    """PRMS evaluation + optional CAM dump feeding IRNet (validate.py:253-387)."""
    forward = make_prms_forward(model, critic)
    acc = SegEvalAccumulator(with_boxes=False)
    cam_out_names = []
    if save_cam and cam_save_dir:
        os.makedirs(cam_save_dir, exist_ok=True)
    step = 0
    for batch in loader.epoch(0):
        valid = np.arange(batch["word_ids"].shape[1])[None] < batch["num_sents"][:, None]
        best, cams, scores = forward(
            variables, critic_vars,
            jnp.asarray(batch["image"]), jnp.asarray(batch["word_ids"]), jnp.asarray(valid),
        )
        best = np.asarray(best)
        cams = np.asarray(cams)
        B = cams.shape[0]
        for b in range(B):
            n = int(batch["num_sents"][b])
            if n == 0:  # padded row of a short final batch
                continue
            target = batch["target"][b]
            oh, ow = target.shape
            cam = resize_to_original_np(cams[b, int(best[b])], oh, ow)
            cam_norm, pred = normalize_threshold(cam)
            acc.add(target, pred, cam_norm.astype(np.float32), batch["bbox"][b], weight=n)
            if save_cam and cam_save_dir:
                idx = int(batch["index"][b])
                img_id = int(batch["img_id"][b])
                np.save(os.path.join(cam_save_dir, f"{idx}_{img_id}.npy"), cam_norm)
                cam_out_names.append(f"{idx}_{img_id}")
        step += 1
        if step % print_freq == 0:
            r = acc.results()
            log(f"prms [{step}] mIoU {r['mIoU']:.3f} oIoU {r['oIoU']:.3f} hit {r['hit']:.3f}")
    if save_cam and name_save_dir:
        os.makedirs(name_save_dir, exist_ok=True)
        with open(os.path.join(name_save_dir, f"{dataset_name}_train_names.json"), "w") as f:
            json.dump(cam_out_names, f)
    return acc.merge_across_processes().results()
