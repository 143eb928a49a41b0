"""`yolox-tpu eval` — re-design of `/root/reference/yolox/cli/eval.py`.

Same flags (--conf/--nms/--tsize/--fuse/--legacy/--test/--speed); loads a
checkpoint (default `out/<name>/best_ckpt.pth`), runs the COCO evaluator
with on-device NMS, prints AP50:95/AP50 + per-class tables.
"""

from __future__ import annotations

import argparse
import os
import sys

from yolox_tpu.cli.utils import parse_model_config_opts, resolve_config
from yolox_tpu.config import validate_config
from yolox_tpu.utils.logger import logger, setup_logger


def make_parser():
    parser = argparse.ArgumentParser("yolox-tpu eval")
    parser.add_argument("-n", "--name", type=str, default=None)
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-b", "--batch-size", type=int, default=64)
    parser.add_argument("-d", "--devices", type=int, default=None)
    parser.add_argument("--num_machines", type=int, default=1)
    parser.add_argument("--machine_rank", type=int, default=0)
    parser.add_argument("--dist-url", type=str, default=None)
    parser.add_argument("--ckpt", type=str, default=None,
                        help="checkpoint file (default "
                             "out/<name>/best_ckpt.pth)")
    parser.add_argument("--conf", type=float, default=None)
    parser.add_argument("--nms", type=float, default=None)
    parser.add_argument("--tsize", type=int, default=None)
    parser.add_argument("--fuse", action="store_true",
                        help="fuse conv+bn before eval")
    parser.add_argument("--fp16", action="store_true",
                        help="bf16 inference")
    parser.add_argument("--int8", action="store_true",
                        help="post-training int8 quantized inference "
                             "(calibrates activation scales on the first "
                             "--calib-batches eval batches, then runs "
                             "every conv+BN+act block on the MXU int8 "
                             "path; see yolox_tpu/ops/quant.py)")
    parser.add_argument("--int8-hbm", action="store_true",
                        help="int8-activations-in-HBM PTQ inference "
                             "(QTensor block interface — the faster int8 "
                             "mode on non-depthwise models; same "
                             "calibration flags as --int8)")
    parser.add_argument("--calib-batches", type=int, default=8,
                        help="number of eval batches used for int8 "
                             "activation-scale calibration")
    parser.add_argument("--calib-pct", type=float, default=None,
                        help="calibrate activation scales at this "
                             "percentile of |x| instead of the abs-max "
                             "(outlier clipping, e.g. 99.99)")
    parser.add_argument("--legacy", action="store_true",
                        help="legacy (ImageNet-normalized) preprocessing")
    parser.add_argument("--test", action="store_true",
                        help="evaluate on test-dev")
    parser.add_argument("--speed", action="store_true",
                        help="speed-test only (random weights)")
    parser.add_argument("-D", dest="opts", action="append", default=[],
                        metavar="KEY=VALUE")
    parser.add_argument("--seed", type=int, default=None)
    return parser


def run_eval(config, args, num_devices=None):
    import jax
    import jax.numpy as jnp

    from yolox_tpu.models.yolox import YoloxModule
    from yolox_tpu.utils.checkpoint import load_checkpoint
    from yolox_tpu.utils.model_utils import fuse_model_params, get_model_info

    is_distributed = jax.process_count() > 1
    evaluator = config.get_evaluator(
        batch_size=args.batch_size, is_distributed=is_distributed,
        testdev=args.test, legacy=args.legacy)

    dtype = jnp.bfloat16 if args.fp16 else jnp.float32
    module = YoloxModule.from_config(config, dtype=dtype)
    logger.info("Model Summary: "
                + get_model_info(module, config.test_size))

    if not args.speed:
        ckpt_file = args.ckpt or os.path.join(
            config.output_dir, args.name or config.name, "best_ckpt.pth")
        logger.info(f"loading checkpoint from {ckpt_file}")
        ckpt = load_checkpoint(ckpt_file)
        module.load_params(ckpt["model"])
        logger.info("loaded checkpoint done.")

    if args.fuse:
        logger.info("\tFusing model...")
        module.load_params(fuse_model_params(module.params))

    if args.int8 or args.int8_hbm:
        logger.info(f"\tCalibrating int8 activation scales on "
                    f"{args.calib_batches} batches...")
        import itertools as it

        batches = (imgs for imgs, *_ in
                   it.islice(iter(evaluator.dataloader), args.calib_batches))
        qtab = module.calibrate_int8(module.params, batches,
                                     percentile=args.calib_pct)
        module.enable_int8(qtab, hbm=args.int8_hbm)
        logger.info(f"\tint8 enabled ({len(qtab)} calibrated conv blocks, "
                    f"mode={'hbm' if args.int8_hbm else 'ladder'}).")

    *_, summary = config.eval(
        module, evaluator, is_distributed, half=args.fp16)
    logger.info("\n" + str(summary))


def main(argv=None) -> int:
    args = make_parser().parse_args(argv)

    if args.num_machines > 1:
        import jax
        from jax.experimental import multihost_utils

        jax.distributed.initialize(
            coordinator_address=args.dist_url,
            num_processes=args.num_machines,
            process_id=args.machine_rank,
        )
        # establish the collective context in lockstep (see cli/train.py)
        multihost_utils.sync_global_devices("yolox-tpu:eval-start")

    config = resolve_config(args.config)
    config.update(parse_model_config_opts(args.opts))
    if args.conf is not None:
        config.test_conf = args.conf
    if args.nms is not None:
        config.nmsthre = args.nms
    if args.tsize is not None:
        config.test_size = (args.tsize, args.tsize)
    validate_config(config)
    if args.name is None:
        args.name = config.name

    setup_logger(os.path.join(config.output_dir, args.name),
                 filename="eval_log.txt", capture_std=True)
    try:
        run_eval(config, args)
    finally:
        from yolox_tpu.utils.logger import restore_sys_output

        restore_sys_output()
    return 0


if __name__ == "__main__":
    sys.exit(main())
