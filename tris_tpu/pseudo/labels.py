"""Pseudo-label pipeline steps: CAM -> ir_label -> instance pseudo-masks.

Re-design of `/root/reference/IRNet/step_refer/cam_to_ir_label.py` and
`make_ins_seg_labels.py`:

- :func:`cam_to_ir_label`: threshold-padded argmax + dense-CRF refinement at
  two confidence levels, combined into {0 bg, 1 fg, 255 ignore}
  (cam_to_ir_label.py:48-76).
- :func:`find_centroids_with_refinement`: 300 iterations of bilinear
  displacement ascent. The reference runs this in NumPy on CPU
  (make_ins_seg_labels.py:18-56); here it is a ``lax.scan`` on device.
- :func:`cluster_centroids` / :func:`detect_instance`: connected components
  via scipy.ndimage (replacing skimage.measure.label).
- :func:`make_instance_masks`: per-image instance pseudo-mask generation with
  the random walk on the MXU (make_ins_seg_labels.py:109-163).

File contract matches the reference: ``ir_label/{name}.png`` and
``ins_seg/{name}.npy`` dicts {'score', 'mask', 'class', 'cam'}.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from tris_tpu.ops.resize import bilinear_resize
from tris_tpu.pseudo.crf import crf_inference_label_multi
from tris_tpu.pseudo.indexing import propagate_to_edge_bucketed


# ---------------------------------------------------------------------------
# step 1: CAM -> ir label (CRF)
# ---------------------------------------------------------------------------

def cam_to_ir_label(
    image: np.ndarray,
    cam: np.ndarray,
    conf_fg_thres: float = 0.3,
    conf_bg_thres: float = 0.1,
) -> np.ndarray:
    """image: [H, W, 3] uint8 (raw, unnormalized); cam: [H, W] in [0, 1].

    Returns uint8 label map: 1 confident fg, 0 confident bg, 255 uncertain.
    """
    cams = np.maximum(cam, 0.0)[None]  # [1, H, W]

    def seed_label(thres: float) -> np.ndarray:
        padded = np.concatenate([np.full_like(cams[:1], thres), cams], axis=0)
        return np.argmax(padded, axis=0).astype(np.int32)

    # both CRF refinements run over the same image -> fused (shared lattice)
    seeds = np.stack([seed_label(conf_fg_thres), seed_label(conf_bg_thres)])
    fg_conf, bg_conf = crf_inference_label_multi(image, seeds, n_labels=2)

    conf = fg_conf.copy().astype(np.uint8)
    conf[fg_conf == 0] = 255
    conf[(bg_conf + fg_conf) == 0] = 0
    return conf


# ---------------------------------------------------------------------------
# step 3a: centroid refinement (device scan)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("iterations",))
def _refine_centroids(displacement: jnp.ndarray, iterations: int = 300) -> jnp.ndarray:
    """displacement: [2, H, W] -> integer centroid coords [2, H, W].

    The reference iterates ``c += bilinear(disp, c)`` 300 times in NumPy
    (make_ins_seg_labels.py:18-56). A direct transcription costs 8 separate
    [H*W]-index gathers per iteration (4 bilinear corners x 2 fields) and is
    VPU-gather-bound (~368 ms at the 128x128 grid). Since the field is
    CONSTANT across iterations, the 2x2 corner values of both fields are
    precomputed once as an 8-wide neighborhood table so each iteration is ONE
    gather. Exactness: the reference samples corners at (floor, ceil); here
    the table holds (floor, floor+1). Every term where they differ (the
    coordinate is integral, ceil == floor != floor+1) carries weight
    ``frac == 0``, and the out-of-range floor+1 column is edge-replicated so
    the zero-weighted operand is finite — bit-identical results.
    """
    H, W = displacement.shape[1:]
    cy0 = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None], (H, W))
    cx0 = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :], (H, W))

    # [H+1, W+1, 2] edge-replicated field, then the 4 corner shifts -> [HW, 8]
    f = jnp.pad(displacement.transpose(1, 2, 0), ((0, 1), (0, 1), (0, 0)), mode="edge")
    neigh = jnp.concatenate(
        [f[:-1, :-1], f[:-1, 1:], f[1:, :-1], f[1:, 1:]], axis=-1
    ).reshape(H * W, 8)  # per flat (y, x): [dy@(y,x), dx@(y,x), ..@(y,x+1), ..@(y+1,x), ..@(y+1,x+1)]

    def body(carry, _):
        cy, cx = carry
        iy = jnp.floor(cy).astype(jnp.int32)
        ix = jnp.floor(cx).astype(jnp.int32)
        yc = (cy - iy)[..., None]
        xc = (cx - ix)[..., None]
        n = neigh[(iy * W + ix).reshape(-1)].reshape(H, W, 8)
        # term order matches the pre-table formulation (and the reference's
        # find_centroids_with_refinement) exactly — fp adds don't reassociate
        v = (
            n[..., 6:8] * yc * xc
            + n[..., 2:4] * (1 - yc) * xc
            + n[..., 4:6] * yc * (1 - xc)
            + n[..., 0:2] * (1 - yc) * (1 - xc)
        )
        ny = jnp.clip(cy + v[..., 0], 0, H - 1)
        nx = jnp.clip(cx + v[..., 1], 0, W - 1)
        return (ny, nx), None

    (cy, cx), _ = jax.lax.scan(body, (cy0, cx0), None, length=iterations)
    return jnp.stack([jnp.round(cy), jnp.round(cx)]).astype(jnp.int32)


def find_centroids_with_refinement(displacement: np.ndarray, iterations: int = 300) -> np.ndarray:
    return np.asarray(_refine_centroids(jnp.asarray(displacement), iterations))


# ---------------------------------------------------------------------------
# step 3b: clustering + instance detection (host connected components)
# ---------------------------------------------------------------------------

def _compress_range(arr: np.ndarray) -> np.ndarray:
    """Relabel values to consecutive 0..K (imutils.compress_range)."""
    uniques, inv = np.unique(arr, return_inverse=True)
    return inv.reshape(arr.shape)


def _to_one_hot(labels: np.ndarray, maximum_val: int | None = None) -> np.ndarray:
    if maximum_val is None:
        maximum_val = int(labels.max()) + 1
    return (np.arange(maximum_val)[:, None, None] == labels[None]).astype(bool)


def cluster_centroids(centroids: np.ndarray, displacement: np.ndarray, thres: float = 2.5) -> np.ndarray:
    """Group pixels whose refined centroids land in the same weak-displacement
    component (make_ins_seg_labels.py:58-75). Returns one-hot [K+1, H, W]."""
    dp_strength = np.sqrt(displacement[1] ** 2 + displacement[0] ** 2)
    h, w = dp_strength.shape
    weak = dp_strength < thres
    dp_label, _ = ndimage.label(weak)  # cross-structure == connectivity 1
    clusters = dp_label.reshape(-1)[centroids[0].reshape(-1) * w + centroids[1].reshape(-1)]
    cluster_map = _compress_range(clusters.reshape(h, w) + 1)
    return _to_one_hot(cluster_map)


def detect_instance(score_map: np.ndarray, masks: np.ndarray, class_ids: np.ndarray,
                    max_fragment_size: float = 0) -> dict:
    """Split instance maps into connected fragments, score them, drop tiny ones
    (make_ins_seg_labels.py:82-105)."""
    pred_score, pred_label, pred_mask = [], [], []
    for ag_score, ag_mask, ag_class in zip(score_map, masks, class_ids):
        if ag_mask.sum() < 1:
            continue
        lab, n = ndimage.label(ag_mask)
        for seg_id in range(1, n + 1):
            seg = lab == seg_id
            if seg.sum() < max_fragment_size:
                pred_score.append(0)
            else:
                pred_score.append(float((ag_score * seg).max()))
            pred_label.append(ag_class)
            pred_mask.append(seg)
    if not pred_mask:
        h, w = masks.shape[1:]
        return {"score": np.zeros((1,)), "mask": np.zeros((1, h, w), bool),
                "class": np.zeros((1,), class_ids.dtype)}
    return {"score": np.stack(pred_score, 0), "mask": np.stack(pred_mask, 0),
            "class": np.stack(pred_label, 0)}


# ---------------------------------------------------------------------------
# step 3: full per-image instance pseudo-mask generation
# ---------------------------------------------------------------------------

def walk_upsample_argmax(
    instance_map: np.ndarray,
    cam: np.ndarray,
    edge,
    orig_size: Tuple[int, int],
    beta: float = 10.0,
    exp_times: int = 8,
    ins_seg_bg_thres: float = 0.25,
    device=None,
):
    """Device half of the per-instance walk (make_ins_seg_labels.py:138-158):
    resize the original-size CAM to the stride-4 grid, mask it per instance,
    random-walk it along low-edge paths, upsample x4, max-normalize, and
    bg-threshold argmax. Dispatch is ASYNC — returns device arrays
    ``(rw_up [K, oh, ow], instance_shape [oh, ow])``; fetching them
    synchronizes. ``edge`` may be a host or device array; ``device`` pins all
    programs to one chip so a sharded pass can drive every local device.
    """
    import jax

    oh, ow = orig_size
    gh, gw = instance_map.shape[1:]
    cam_d = jax.device_put(np.asarray(cam, np.float32), device)
    cam_small = bilinear_resize(cam_d[None, None], (gh, gw), align_corners=True)[0, 0]
    inst_d = jax.device_put(instance_map.astype(np.float32), device)
    instance_cam = cam_small[None] * inst_d  # [K, gh, gw]

    if isinstance(edge, np.ndarray):
        edge = jax.device_put(np.asarray(edge, np.float32), device)
    rw = propagate_to_edge_bucketed(
        instance_cam, edge, radius=5, beta=beta, exp_times=exp_times, device=device,
    )  # [K, gh, gw] device

    rw_up = bilinear_resize(
        rw[:, None], (gh * 4, gw * 4), align_corners=False
    )[:, 0, :oh, :ow]
    rw_up = rw_up / jnp.max(rw_up)
    rw_up_bg = jnp.concatenate(
        [jnp.full((1, oh, ow), ins_seg_bg_thres, rw_up.dtype), rw_up], axis=0
    )
    instance_shape = jnp.argmax(rw_up_bg, axis=0)
    return rw_up, instance_shape


def detect_from_walk(rw_up_np: np.ndarray, instance_shape_np: np.ndarray,
                     orig_size: Tuple[int, int]) -> dict:
    """Host half after the walk: one-hot the argmax'd instance shape, split
    into connected fragments, score, drop <1%-of-image fragments
    (make_ins_seg_labels.py:149-163). Returns the npy-dict contract
    {'score', 'mask', 'class', 'cam'}."""
    oh, ow = orig_size
    K = rw_up_np.shape[0]
    one_hot = _to_one_hot(instance_shape_np, maximum_val=K + 1)[1:]
    class_ids = np.zeros((K,), np.int64)  # single 'referred' class
    detected = detect_instance(rw_up_np, one_hot, class_ids,
                               max_fragment_size=oh * ow * 0.01)
    detected["cam"] = rw_up_np
    return detected


def make_instance_masks(
    edge: np.ndarray,
    disp: np.ndarray,
    cam: np.ndarray,
    orig_size: Tuple[int, int],
    beta: float = 10.0,
    exp_times: int = 8,
    ins_seg_bg_thres: float = 0.25,
) -> dict:
    """edge: [h4, w4]; disp: [2, h4, w4]; cam: [oh, ow] (original size).

    Returns the ins_seg dict (make_ins_seg_labels.py:119-163). Serial
    convenience API; the sharded/pipelined pass (pseudo/pipeline.py::
    run_make_ins_seg) drives the same stage functions directly.
    """
    centroids = find_centroids_with_refinement(disp)
    instance_map = cluster_centroids(centroids, disp)  # [K, h4, w4]
    rw_up, instance_shape = walk_upsample_argmax(
        instance_map, cam, np.asarray(edge, np.float32), orig_size,
        beta=beta, exp_times=exp_times, ins_seg_bg_thres=ins_seg_bg_thres,
    )
    return detect_from_walk(np.asarray(rw_up), np.asarray(instance_shape), orig_size)
