"""Stage-1 training entry point (re-design of `/root/reference/train_stage1.py`).

Same UX: ``python -m tris_tpu.cli.train_stage1 --dataset refcocog --splitBy umd
--batch_size 48 --size 320 --epoch 15 --negative_samples 3 ...``.

TPU-first loop: one data-parallel mesh, one jitted train step (model fwd/bwd +
frozen ViT critic + optimizer + poly LR), host prefetch, per-epoch batched
validation, best-by-mIoU / best-by-hit checkpoints with previous-best removal.
"""

from __future__ import annotations

import datetime
import time

import jax
import jax.numpy as jnp
import numpy as np

from tris_tpu.ckpt.io import BestCheckpointKeeper, load_params_only
from tris_tpu.cli.common import (
    build_critic,
    build_loaders,
    build_stage1,
    load_pretrained,
)
from tris_tpu.config import get_parser
from tris_tpu.eval.validate import validate
from tris_tpu.parallel.mesh import shard_batch
from tris_tpu.parallel.tp import shard_tree, training_mesh
from tris_tpu.train.stage1 import Stage1LossWeights, make_train_step
from tris_tpu.train.state import create_train_state
from tris_tpu.utils.logging import MetricsWriter, create_logger


def main(args):
    if getattr(args, "multihost", False):
        jax.distributed.initialize()  # NCCL init_process_group equivalent
    logger = create_logger(jax.process_index())
    writer = MetricsWriter(args.board_folder)
    mesh = training_mesh(args.batch_size, getattr(args, "tp", 1))

    model, variables = build_stage1(args, train=True)
    critic, critic_vars = build_critic(args)

    resume_train_ckpt = None
    if args.resume and args.pretrain:
        if args.pretrain.endswith((".pth", ".pt")):
            variables = load_pretrained(args, model, variables, "stage1")
        else:
            resume_train_ckpt = args.pretrain  # full resume after state creation
            if args.eval:
                variables = load_pretrained(args, model, variables, "stage1")

    eval_splits = args.test_split.split(",")
    loaders = build_loaders(args, train=not args.eval, eval_splits=eval_splits)

    if args.eval:
        eval_vars = {k: variables[k] for k in ("params", "batch_stats") if k in variables}
        for split in eval_splits:
            res = validate(model, eval_vars, loaders[split], log=logger.info)
            logger.info(f"[{split}] {res}")
        return

    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables["params"]))
    logger.info(f"number of params: {n_params / 1e6:.2f}M")

    steps_per_epoch = len(loaders["train"])
    total_steps = steps_per_epoch * args.epoch
    state = create_train_state(
        model, variables, total_steps=total_steps, base_lr=args.lr,
        lr_multi=args.lr_multi, weight_decay=args.weight_decay, stage="stage1",
    )
    start_epoch = args.start_epoch
    if resume_train_ckpt:
        from tris_tpu.ckpt.io import resume_train_state

        state, resumed_epoch = resume_train_state(resume_train_ckpt, state)
        if resumed_epoch is not None:
            start_epoch = resumed_epoch
        logger.info(f"resumed from {resume_train_ckpt} at epoch {start_epoch}")
    weights = Stage1LossWeights(w1=args.w1, w4=args.w4, w5=args.w5)
    step_fn = make_train_step(model, critic, weights)
    if getattr(args, "tp", 1) > 1:
        # annotate params/moments/critic with 'model'-axis shardings; GSPMD
        # propagates the tensor-parallel layout through the jitted step
        state = shard_tree(state, mesh)
        critic_vars = shard_tree(critic_vars, mesh)
    else:
        critic_vars = jax.device_put(critic_vars)

    keeper = BestCheckpointKeeper(args.output or "./output")
    iteration = start_epoch * steps_per_epoch
    t_start = time.time()
    profile_dir = getattr(args, "profile", None)
    for epoch in range(start_epoch, args.epoch):
        ep_start = time.time()
        batch_times = []
        for batch in loaders["train"].epoch(epoch):
            t0 = time.time()
            if profile_dir and iteration == 10:
                jax.profiler.start_trace(profile_dir)
            batch = shard_batch(mesh, batch)
            state, metrics = step_fn(state, batch, critic_vars)
            if profile_dir and iteration == 20:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                logger.info(f"profiler trace written to {profile_dir}")
            iteration += 1
            if iteration % args.print_freq == 0:
                m = {k: float(v) for k, v in metrics.items()}
                writer.scalars(m, iteration, prefix="train/")
                eta = np.mean(batch_times[-50:] or [0]) * (total_steps - iteration)
                logger.info(
                    f"Train:[{epoch:2d}/{args.epoch}][{iteration % steps_per_epoch:4d}/{steps_per_epoch}] "
                    f"| loss {m['loss']:.4f} | l1 {m['l1']:.4f} | l4 {m['l4']:.4f} "
                    f"| l5 {m['l5']:.4f} | eta {datetime.timedelta(seconds=int(eta))}"
                )
            batch_times.append(time.time() - t0)

        logger.info(f"EPOCH {epoch} took {datetime.timedelta(seconds=int(time.time() - ep_start))}")

        eval_vars = {"params": state.params, "batch_stats": state.batch_stats}
        results = {}
        for split in eval_splits:
            # --fast_eval: selection needs only mIoU/hit -> scalars-only
            # device metrics, no per-batch map fetches
            results[split] = validate(model, eval_vars, loaders[split], log=logger.info,
                                      with_boxes=not args.fast_eval)
            logger.info(f"[epoch {epoch}] {split}: {results[split]}")
        primary = results[eval_splits[0]]
        best = keeper.update(epoch, primary["mIoU"], primary["hit"], state,
                             extra={"epoch": epoch})
        writer.scalars({"mIoU": primary["mIoU"], "oIoU": primary["oIoU"],
                        "hit": primary["hit"]}, epoch, prefix="test/")
        logger.info(f"best: {best}")

    # final: reload best, validate on the train split (train_stage1.py:226-242)
    keeper.wait()  # flush async saves before reading the best ckpt back
    if keeper.best["path"]:
        state = state.replace(params=load_params_only(keeper.best["path"], state.params))
    train_eval = build_loaders(args, train=False, eval_splits=["train"])["train"]
    eval_vars = {"params": state.params, "batch_stats": state.batch_stats}
    res = validate(model, eval_vars, train_eval, log=logger.info)
    logger.info(f"validate on train split: {res}")
    logger.info(f"total time {datetime.timedelta(seconds=int(time.time() - t_start))}")
    writer.close()


if __name__ == "__main__":
    main(get_parser().parse_args())
