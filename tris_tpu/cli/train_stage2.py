"""Stage-2 training entry point (re-design of `/root/reference/train_stage2.py`).

Trains the encoder-decoder on IRNet pseudo-masks (``--pseudo_path``), with
optional EMA mean-teacher consistency (``--model_ema --consistency_type mse``).
"""

from __future__ import annotations

import datetime
import time

import jax
import numpy as np

from tris_tpu.ckpt.io import BestCheckpointKeeper, load_params_only
from tris_tpu.cli.common import build_loaders, build_stage2, load_pretrained
from tris_tpu.config import get_parser
from tris_tpu.eval.validate import validate
from tris_tpu.parallel.mesh import shard_batch
from tris_tpu.parallel.tp import shard_tree, training_mesh
from tris_tpu.train.stage2 import Stage2TrainConfig, make_train_step
from tris_tpu.train.state import create_train_state
from tris_tpu.utils.logging import MetricsWriter, create_logger


def main(args):
    if getattr(args, "multihost", False):
        jax.distributed.initialize()
    logger = create_logger(jax.process_index())
    writer = MetricsWriter(args.board_folder)
    mesh = training_mesh(args.batch_size, getattr(args, "tp", 1))

    model, variables = build_stage2(args, train=True)
    resume_train_ckpt = None
    if args.resume and args.pretrain:
        if args.pretrain.endswith((".pth", ".pt")) or args.eval:
            variables = load_pretrained(args, model, variables, "stage2")
        else:
            resume_train_ckpt = args.pretrain

    eval_splits = args.test_split.split(",")
    loaders = build_loaders(args, train=not args.eval, eval_splits=eval_splits)

    if args.eval:
        eval_vars = {k: variables[k] for k in ("params", "batch_stats") if k in variables}
        for split in eval_splits:
            res = validate(model, eval_vars, loaders[split], log=logger.info)
            logger.info(f"[{split}] {res}")
        return

    steps_per_epoch = len(loaders["train"])
    total_steps = steps_per_epoch * args.epoch
    # scheduler branch as the reference (train_stage2.py:128-140): CLIP
    # backbones use the per-step poly LambdaLR; anything else gets the
    # epoch-level PolynomialLRDecay driven by --end_lr/--power/--max_decay_steps
    schedule_factory = None
    if "clip" not in args.backbone:
        from tris_tpu.train.state import poly_epoch_schedule

        schedule_factory = lambda lr: poly_epoch_schedule(  # noqa: E731
            lr, args.end_lr, args.power, args.max_decay_steps, steps_per_epoch
        )
    state = create_train_state(
        model, variables, total_steps=total_steps, base_lr=args.lr,
        lr_multi=args.lr_multi, weight_decay=args.weight_decay, stage="stage2",
        with_ema=args.model_ema, schedule_factory=schedule_factory,
    )
    start_epoch = args.start_epoch
    if resume_train_ckpt:
        from tris_tpu.ckpt.io import resume_train_state

        state, resumed_epoch = resume_train_state(resume_train_ckpt, state)
        if resumed_epoch is not None:
            start_epoch = resumed_epoch
        logger.info(f"resumed from {resume_train_ckpt} at epoch {start_epoch}")
    tcfg = Stage2TrainConfig(use_ema=args.model_ema, consistency=args.consistency_type)
    step_fn = make_train_step(model, tcfg)
    if getattr(args, "tp", 1) > 1:
        # 'model'-axis shardings on params/moments/EMA; GSPMD propagates
        state = shard_tree(state, mesh)

    keeper = BestCheckpointKeeper(args.output or "./output")
    iteration = start_epoch * steps_per_epoch
    t_start = time.time()
    for epoch in range(start_epoch, args.epoch):
        for batch in loaders["train"].epoch(epoch):
            batch = shard_batch(mesh, batch)
            state, metrics = step_fn(state, batch)
            iteration += 1
            if iteration % args.print_freq == 0:
                m = {k: float(v) for k, v in metrics.items()}
                writer.scalars(m, iteration, prefix="train/")
                logger.info(
                    f"Train:[{epoch:2d}/{args.epoch}][{iteration:6d}/{total_steps}] "
                    f"| loss {m['loss']:.4f} | l1 {m['l1']:.4f} | l5 {m['l5']:.4f}"
                )

        if getattr(args, "ema_eval", False) and state.ema_params is not None:
            eval_vars = {"params": state.ema_params, "batch_stats": state.ema_batch_stats}
        else:
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
        writer.scalars({"mIoU": primary["mIoU"], "hit": primary["hit"]}, epoch, prefix="test/")
        logger.info(f"best: {best}")

    keeper.wait()  # flush async saves before reading the best ckpt back
    if keeper.best["path"]:
        state = state.replace(params=load_params_only(keeper.best["path"], state.params))
    train_eval = build_loaders(args, train=False, eval_splits=["train"])["train"]
    res = validate(model, {"params": state.params, "batch_stats": state.batch_stats},
                   train_eval, log=logger.info)
    logger.info(f"validate on train split: {res}")
    logger.info(f"total time {datetime.timedelta(seconds=int(time.time() - t_start))}")
    writer.close()


if __name__ == "__main__":
    main(get_parser().parse_args())
