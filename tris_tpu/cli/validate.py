"""Evaluation entry point (re-design of `/root/reference/validate.py` +
`validate_referit.py`).

Standard eval:   ``python -m tris_tpu.cli.validate --dataset refcocog --splitBy
umd --test_split val --size 320 --resume --eval --pretrain ckpt``.
PRMS CAM dump:   add ``--prms --save_cam --cam_save_dir ... --name_save_dir ...``.
ReferIt:         ``--dataset referit`` uses the flicker pickle protocol.
"""

from __future__ import annotations

import jax

from tris_tpu.cli.common import build_critic, build_loaders, build_stage1, load_pretrained
from tris_tpu.config import get_parser
from tris_tpu.eval.validate import validate, validate_prms
from tris_tpu.utils.logging import create_logger


def main(args):
    logger = create_logger(jax.process_index())
    stage = int(getattr(args, "stage", 1))
    if stage == 2:
        # --stage 2: evaluate the stage-2 encoder-decoder (the reference flips
        # validate.py between model_stage1/2 by editing its import)
        from tris_tpu.cli.common import build_stage2

        if args.prms:
            raise SystemExit("--prms scores stage-1 response maps; use --stage 1")
        model, variables = build_stage2(args, train=False)
    else:
        model, variables = build_stage1(args, train=False)
    if args.pretrain:
        variables = load_pretrained(args, model, variables, f"stage{stage}")
    eval_vars = {k: variables[k] for k in ("params", "batch_stats") if k in variables}

    if args.dataset == "referit":
        from tris_tpu.data.referit import ReferItTestDataset
        from tris_tpu.eval.validate_referit import validate_referit

        ds = ReferItTestDataset(args.refer_data_root, split=args.test_split,
                                size=args.size, max_tokens=args.max_query_len)
        res = validate_referit(model, eval_vars, ds, log=logger.info)
        logger.info(f"[referit/{args.test_split}] {res}")
        return res

    # shard eval batches over every local chip that divides eval_batch
    # (single chip -> None, plain transfers). Multihost eval instead shards
    # REFS across processes (cli/common.py) and merges metric counters, so
    # the in-process mesh stays off there.
    mesh = None
    if jax.process_count() == 1 and jax.device_count() > 1:
        from tris_tpu.parallel.mesh import create_mesh_for_batch

        mesh = create_mesh_for_batch(args.eval_batch)
        if len(mesh.devices) == 1:
            mesh = None

    results = {}
    for split in args.test_split.split(","):
        loaders = build_loaders(args, train=False, eval_splits=[split])
        if args.prms:
            critic, critic_vars = build_critic(args)
            res = validate_prms(
                model, critic, eval_vars, critic_vars, loaders[split],
                save_cam=args.save_cam, cam_save_dir=args.cam_save_dir,
                name_save_dir=args.name_save_dir, dataset_name=args.dataset,
                log=logger.info, host_threads=args.host_threads,
                device_resize=not args.no_device_resize, mesh=mesh,
            )
        else:
            res = validate(
                model, eval_vars, loaders[split],
                save_cam=args.save_cam, cam_save_dir=args.cam_save_dir,
                name_save_dir=args.name_save_dir, dataset_name=args.dataset,
                log=logger.info, host_threads=args.host_threads,
                device_resize=not args.no_device_resize, mesh=mesh,
            )
        results[split] = res
        logger.info(f"[{split}] {res}")
    return results


if __name__ == "__main__":
    main(get_parser().parse_args())
