"""IRNet pseudo-labeling pipeline orchestration.

Re-design of `/root/reference/IRNet/run_sample_refer.py`'s three runnable
passes with the same file contract:

  1. cam_to_ir_label: ``{cam_dir}/{name}.npy`` -> ``{ir_label_dir}/{name}.png``
  2. train_irn:       ir labels -> trained IRNet params (orbax/npz)
  3. make_ins_seg:    CAMs + IRNet -> ``{ins_seg_dir}/{name}.npy`` dicts

Image naming follows the reference (voc12/dataloader.py:117-188): names are
``{idx}_{img_id}``, resolving to ``COCO_train2014_{img_id:012d}.jpg`` or
``{img_id}.jpg`` for ReferIt.
"""

from __future__ import annotations

import dataclasses
import json
import os
from concurrent.futures import ProcessPoolExecutor
from typing import List, Optional

import numpy as np
from PIL import Image

from tris_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


@dataclasses.dataclass
class PseudoConfig:
    train_list: str = ""                # names json from PRMS
    data_root: str = "./data/train2014"
    cam_dir: str = "./out/cam"
    ir_label_dir: str = "./out/ir_label"
    ins_seg_dir: str = "./out/ins_seg"
    irn_weights: str = "./out/irn.msgpack"
    conf_fg_thres: float = 0.3
    conf_bg_thres: float = 0.1
    crop_size: int = 512
    radius: int = 10
    beta: float = 10.0
    exp_times: int = 8
    ins_seg_bg_thres: float = 0.25
    num_workers: int = 8
    referit: bool = False
    # multi-scale hook of ReferClassificationDatasetMSF (voc12/dataloader.py:
    # 304-348); the reference's live pass runs at (1.0,) and consumes only the
    # first scale (make_ins_seg_labels.py:126,177-179) — same here.
    scales: tuple = (1.0,)


def load_names(cfg: PseudoConfig) -> List[str]:
    with open(cfg.train_list) as f:
        return json.load(f)


def image_path(cfg: PseudoConfig, name: str) -> str:
    img_id = name.split("_")[-1]
    if cfg.referit or "referit" in cfg.data_root:
        return os.path.join(cfg.data_root, f"{img_id}.jpg")
    return os.path.join(cfg.data_root, f"COCO_train2014_{int(img_id):012d}.jpg")


def load_raw_image(cfg: PseudoConfig, name: str) -> np.ndarray:
    path = image_path(cfg, name)
    if path.lower().endswith((".jpg", ".jpeg")):
        from tris_tpu.data.transforms import _native_jpeg

        nat = _native_jpeg()  # honors TRIS_NATIVE_DECODE=0
        if nat is not None:
            try:  # grayscale replicates to 3ch in-library, same bytes as the
                # stack below (test-pinned in test_native.py)
                with open(path, "rb") as f:
                    out = nat.jpeg_decode(f.read())
                if out is not None:
                    return out
            except Exception:
                pass
    img = np.asarray(Image.open(path))
    if img.ndim == 2:  # grayscale -> 3ch (voc12/dataloader.py:164-166)
        img = np.stack([img] * 3, axis=-1)
    return img


def normalize_image(img: np.ndarray) -> np.ndarray:
    return ((img.astype(np.float32) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD


def _ir_label_one(args) -> str:
    cfg, name = args
    from tris_tpu.pseudo.labels import cam_to_ir_label

    img = load_raw_image(cfg, name)
    cam = np.load(os.path.join(cfg.cam_dir, name + ".npy"), allow_pickle=True)
    cam = np.asarray(cam, np.float32)
    conf = cam_to_ir_label(img, cam, cfg.conf_fg_thres, cfg.conf_bg_thres)
    out = os.path.join(cfg.ir_label_dir, name + ".png")
    Image.fromarray(conf).save(out)
    return out


def run_cam_to_ir_label(cfg: PseudoConfig, names: Optional[List[str]] = None, parallel: bool = True):
    """CPU-parallel CRF labeling (the reference uses multiprocessing.spawn,
    cam_to_ir_label.py:82-92)."""
    names = names if names is not None else load_names(cfg)
    os.makedirs(cfg.ir_label_dir, exist_ok=True)
    tasks = [(cfg, n) for n in names]
    if parallel and len(names) > 1:
        with ProcessPoolExecutor(max_workers=cfg.num_workers) as ex:
            list(ex.map(_ir_label_one, tasks, chunksize=4))
    else:
        for t in tasks:
            _ir_label_one(t)


def irn_train_batches(cfg: PseudoConfig, names: List[str], path_index, batch_size: int,
                      epochs: int, seed: int = 1234, num_threads: Optional[int] = None,
                      process_index: int = 0, process_count: int = 1,
                      labels: str = "device"):
    """Yield augmented affinity-training batches (ReferAffinityDataset
    equivalent: rescale(0.5,1.5) + hflip + random crop 512, quarter-scale
    labels -> affinity labels).

    Batches are built by ``num_threads`` worker threads (default
    ``cfg.num_workers``) and yielded in order while the device trains on the
    previous one — the reference feeds this trainer with DataLoader workers
    (train_irn.py:33-45); a single-threaded synchronous build costs ~1.3 s of
    host work per bs-24 batch (measured, COCO-shaped images, device-label
    feed — docs/PERF_NOTES.md round 5) and would starve the ~0.6 s device
    step. A short final batch wraps
    around to the epoch's first samples instead of being dropped, keeping one
    compiled batch shape while consuming every example. Deterministic given
    (seed, epoch, batch): every example's augs draw from a per-batch stream,
    independent of thread scheduling.

    Multihost: ``process_index``/``process_count`` stride each process into a
    disjoint slice of the shared per-epoch permutation (the Loader /
    DistributedSampler convention), truncated to ``n // process_count``
    examples so every process yields the SAME number of batches — a multihost
    step is a collective, so ragged per-process batch counts would deadlock.
    ``batch_size`` stays the PER-PROCESS batch (parallel/mesh.py semantics).

    ``labels="device"`` (default) yields the quarter-scale ir label map
    (``reduced_label`` [B, h4, w4] int32, 16 KB/example) and the jitted step
    builds the pair masks on device
    (train_irn.py::affinity_labels_on_device); ``labels="host"`` yields the
    three precomputed mask tensors (~24 MB/example — measured round 5 as
    most of the 3.6 s/batch host cost AND an untenable ~0.5 GB/batch of H2D
    through the TPU relay). Values are identical either way.
    """
    import queue
    import threading

    from tris_tpu.pseudo.aug import (
        affinity_labels_from_indices,
        pil_rescale,
        random_crop_pair,
        random_lr_flip_pair,
        random_scale_pair,
    )

    num_threads = cfg.num_workers if num_threads is None else num_threads
    n = len(names)
    local_n = max(n // process_count, 1) if process_count > 1 else n
    nb_per_epoch = -(-local_n // batch_size)  # ceil: the final short batch wraps

    epoch_rng = np.random.default_rng(seed)
    orders = [epoch_rng.permutation(n) for _ in range(epochs)]
    if process_count > 1:
        # strided DistributedSampler split, truncated/tiled to exactly
        # local_n so every process yields the same batch count (np.resize
        # tiles when a process's stride lands on < local_n names, e.g. more
        # processes than names)
        orders = [np.resize(o[process_index::process_count] if
                            o[process_index::process_count].size else o,
                            local_n) for o in orders]

    def make_batch(epoch: int, b: int) -> dict:
        order = orders[epoch]
        idxs = order[b * batch_size : (b + 1) * batch_size]
        if len(idxs) < batch_size:  # wrap the final short batch (tiled if n < bs)
            idxs = np.concatenate([idxs, np.resize(order, batch_size - len(idxs))])
        rng = np.random.default_rng(
            (seed * 1000003 + epoch * 131 + b + process_index * 97003) % (2 ** 63))
        imgs, reduceds, bgs, fgs, negs = [], [], [], [], []
        for i in idxs:
            name = names[i]
            img = load_raw_image(cfg, name)
            label = np.asarray(Image.open(os.path.join(cfg.ir_label_dir, name + ".png")))
            img, label = random_scale_pair(img, label, (0.5, 1.5), rng)
            img = normalize_image(img)
            img, label = random_lr_flip_pair(img, label, rng)
            img, label = random_crop_pair(img, label, cfg.crop_size, rng)
            reduced = pil_rescale(label, 0.25, 0)
            imgs.append(img)
            if labels == "device":
                # uint8 on the wire (values are {0, 1, 255}): the 128x128
                # quarter grid is exactly 16 KB/example; the device build
                # widens to int32 itself
                reduceds.append(reduced.astype(np.uint8))
            else:
                bg, fg, neg = affinity_labels_from_indices(
                    reduced, path_index.src_indices, path_index.dst_indices
                )
                bgs.append(bg)
                fgs.append(fg)
                negs.append(neg)
        out = {"image": np.stack(imgs).astype(np.float32)}
        if labels == "device":
            out["reduced_label"] = np.stack(reduceds)
        else:
            out["aff_bg_pos"] = np.stack(bgs)
            out["aff_fg_pos"] = np.stack(fgs)
            out["aff_neg"] = np.stack(negs)
        return out

    tasks = [(e, b) for e in range(epochs) for b in range(nb_per_epoch)]
    if num_threads <= 1 or len(tasks) <= 1:
        for e, b in tasks:
            yield make_batch(e, b)
        return

    q: "queue.Queue" = queue.Queue(maxsize=num_threads)
    stop = threading.Event()

    def worker(tid: int):
        for t in range(tid, len(tasks), num_threads):
            if stop.is_set():
                return
            q.put((t, make_batch(*tasks[t])))

    threads = [threading.Thread(target=worker, args=(t,), daemon=True)
               for t in range(min(num_threads, len(tasks)))]
    for t in threads:
        t.start()
    try:
        pending, next_t, received = {}, 0, 0
        while received < len(tasks):
            t, batch = q.get()
            pending[t] = batch
            received += 1
            while next_t in pending:
                yield pending.pop(next_t)
                next_t += 1
        while next_t in pending:
            yield pending.pop(next_t)
            next_t += 1
    finally:
        stop.set()


def run_train_irn(cfg: PseudoConfig, names: Optional[List[str]] = None,
                  epochs: int = 3, batch_size: int = 24, lr: float = 0.1, log=print):
    """Affinity/displacement training, data-parallel over the device mesh.

    The reference wraps this trainer in ``DataParallel`` and its recipe scales
    it to 4 GPUs at global bs 96 (train_irn.py:38, README.md:127-142). Here the
    PER-PROCESS batch is sharded over a ``Mesh`` under the jitted step, so
    GSPMD inserts the gradient all-reduces (the trunk's BN is frozen, so there
    is no SyncBN concern); multihost processes feed disjoint strided slices of
    the shared permutation, matching the stage-1/2 trainers.
    """
    import jax

    from tris_tpu.ckpt.io import save_variables
    from tris_tpu.parallel.mesh import create_mesh_for_batch, replicate_tree, shard_batch
    from tris_tpu.pseudo.indexing import PathIndex
    from tris_tpu.pseudo.irnet import IRNet
    from tris_tpu.pseudo.train_irn import (
        IRNTrainConfig, calibrate_mean_shift, create_irn_state, make_irn_train_step,
    )

    names = names if names is not None else load_names(cfg)
    path_index = PathIndex(cfg.radius, (cfg.crop_size // 4, cfg.crop_size // 4))
    model = IRNet()
    import jax.numpy as jnp

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.crop_size, cfg.crop_size, 3)))
    tcfg = IRNTrainConfig(crop_size=cfg.crop_size, radius=cfg.radius, lr=lr,
                          epochs=epochs, batch_size=batch_size)
    n_proc = jax.process_count()
    local_n = max(len(names) // n_proc, 1) if n_proc > 1 else len(names)
    max_step = -(-local_n // batch_size) * epochs  # ceil: short batch wraps
    state = create_irn_state(model, variables, tcfg, max(max_step, 1))
    mesh = create_mesh_for_batch(batch_size)
    if mesh.devices.size > 1 or n_proc > 1:
        log(f"irn train: DP over {mesh.devices.size} local devices x {n_proc} processes "
            f"(global batch {batch_size * n_proc})")
    state = replicate_tree(mesh, state)
    step_fn = make_irn_train_step(model, path_index)

    it = 0
    for batch in irn_train_batches(cfg, names, path_index, batch_size, epochs,
                                   process_index=jax.process_index(),
                                   process_count=n_proc):
        state, metrics = step_fn(state, shard_batch(mesh, batch))
        it += 1
        if it % 50 == 0:
            log(f"irn step {it}/{max_step} loss={float(metrics['loss']):.4f}")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    # displacement mean calibration over (top-left-cropped) train images
    from tris_tpu.pseudo.aug import top_left_crop

    def calib_batches():
        for start in range(0, len(names) - batch_size + 1, batch_size):
            imgs = []
            for name in names[start : start + batch_size]:
                img = normalize_image(load_raw_image(cfg, name))
                imgs.append(top_left_crop(img, cfg.crop_size, 0))
            yield {"image": np.stack(imgs).astype(np.float32)}

    variables = calibrate_mean_shift(model, variables, calib_batches())
    save_variables(cfg.irn_weights, variables)
    return variables


def _ins_seg_load(cfg: PseudoConfig, name: str):
    """Host input stage: decode the image, normalize (or MSF-stack), load CAM."""
    raw = load_raw_image(cfg, name)
    oh, ow = raw.shape[:2]
    if len(cfg.scales) == 1 and cfg.scales[0] == 1.0:
        img = normalize_image(raw)  # default path: no stack allocations
    else:
        # MSF stacks at cfg.scales on the RAW image (rescale then normalize,
        # as the reference does); like the reference (pack['img'][0]), only
        # the first scale feeds inference — flip averaging is in the model.
        from tris_tpu.pseudo.aug import multi_scale_flip_stacks

        img = normalize_image(multi_scale_flip_stacks(raw, cfg.scales)[0][0])
    cam = np.asarray(
        np.load(os.path.join(cfg.cam_dir, name + ".npy"), allow_pickle=True), np.float32
    )
    return name, (oh, ow), img, cam


def _ins_seg_worker(cfg: PseudoConfig, model, variables, names: List[str], device,
                    progress, io_threads: int = 2, depth: int = 1):
    """Per-device ins_seg worker: a software pipeline where image k+1's device
    programs (EdgeDisplacement forward, centroid-refinement scan, random walk)
    are dispatched BEFORE image k's host work (connected components,
    detect_instance, npy write) runs — jax dispatch is async, so host and
    device overlap instead of serializing (the round-3 pass alternated them).

    Stages per image:
      S1 (device, async): edge/disp inference + centroid refinement
      S2 (host):  fetch disp/centroids -> cluster_centroids (CCL)
         (device, async): CAM resize+mask -> bucketed walk -> upsample/argmax
      S3 (host):  fetch walk outputs -> detect_instance -> save npy
    ``depth`` is how many images sit between a stage's dispatch and its fetch.
    """
    import collections

    import jax

    from tris_tpu.pseudo.irnet import edge_displacement_infer
    from tris_tpu.pseudo.labels import (
        _refine_centroids,
        cluster_centroids,
        detect_from_walk,
        walk_upsample_argmax,
    )

    vars_d = jax.device_put(variables, device)
    use_jit = os.environ.get("TRIS_IRN_JIT", "1") == "1"
    from concurrent.futures import ThreadPoolExecutor

    q1: collections.deque = collections.deque()
    q2: collections.deque = collections.deque()

    def s1(item):
        name, osize, img, cam = item
        img_d = jax.device_put(img, device)
        edge, disp = edge_displacement_infer(model, vars_d, img_d, jit=use_jit)
        cents = _refine_centroids(disp)
        q1.append((name, osize, cam, edge, disp, cents))

    def s2():
        name, osize, cam, edge, disp, cents = q1.popleft()
        instance_map = cluster_centroids(np.asarray(cents), np.asarray(disp))
        rw_up, shape = walk_upsample_argmax(
            instance_map, cam, edge, osize,
            beta=cfg.beta, exp_times=cfg.exp_times,
            ins_seg_bg_thres=cfg.ins_seg_bg_thres, device=device,
        )
        q2.append((name, osize, rw_up, shape))

    def s3():
        name, osize, rw_up, shape = q2.popleft()
        detected = detect_from_walk(np.asarray(rw_up), np.asarray(shape), osize)
        np.save(os.path.join(cfg.ins_seg_dir, name + ".npy"), detected)  # dict npy
        progress(name)

    with ThreadPoolExecutor(max_workers=max(1, io_threads)) as io:
        for item in io.map(lambda n: _ins_seg_load(cfg, n), names):
            s1(item)
            if len(q1) > depth:
                s2()
            if len(q2) > depth:
                s3()
        while q1:
            s2()
            if len(q2) > depth:
                s3()
        while q2:
            s3()


def run_make_ins_seg(cfg: PseudoConfig, variables=None, names: Optional[List[str]] = None,
                     log=print, devices=None, num_shards: Optional[int] = None,
                     shard_idx: Optional[int] = None, depth: int = 1):
    """Instance pseudo-mask generation, sharded over devices and pipelined.

    Mirrors the reference's multi-GPU fan-out (make_ins_seg_labels.py:111-117,
    175-184: ``multiprocessing.spawn`` over strided ``split_dataset`` shards)
    the TPU way: the name list is strided first across PROCESSES
    (``jax.process_index``), then across each process's LOCAL DEVICES with one
    worker thread per chip; within a worker, host and device work are
    pipelined (see :func:`_ins_seg_worker`). Outputs are identical to the
    serial pass — every image's programs and host steps are unchanged, only
    overlapped.

    ``num_shards``/``shard_idx`` override the process-level striding for
    external sharding (e.g. a job array); ``devices`` restricts the chips.
    """
    import jax

    from tris_tpu.ckpt.io import load_variables
    from tris_tpu.pseudo.irnet import IRNet

    names = names if names is not None else load_names(cfg)
    if num_shards is None:
        num_shards, shard_idx = jax.process_count(), jax.process_index()
    if num_shards > 1:
        names = names[shard_idx :: num_shards]  # strided split (torchutils.py:66-68)
    if variables is None:
        variables = load_variables(cfg.irn_weights)
    model = IRNet()
    os.makedirs(cfg.ins_seg_dir, exist_ok=True)

    devices = list(devices) if devices is not None else jax.local_devices()
    devices = devices[: max(1, len(names))]

    import threading

    done = 0
    lock = threading.Lock()

    def progress(name):
        nonlocal done
        with lock:
            done += 1
            if done % 50 == 0:
                log(f"ins_seg {done}/{len(names)}")

    if len(devices) == 1:
        _ins_seg_worker(cfg, model, variables, names, devices[0], progress, depth=depth)
        return

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(devices)) as pool:
        futures = [
            pool.submit(_ins_seg_worker, cfg, model, variables,
                        names[d :: len(devices)], dev, progress, depth=depth)
            for d, dev in enumerate(devices)
        ]
        for f in futures:
            f.result()  # propagate worker exceptions
