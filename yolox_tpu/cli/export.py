"""`yolox-tpu export` — portable model export.

TPU-native counterpart of the reference's (dead) ONNX/TorchScript/TRT
exporters (`/root/reference/yolox/cli/export_onnx.py` etc.): serializes the
serving computation (forward + in-graph decode, optionally + NMS) as a
StableHLO artifact via `jax.export` — loadable from any StableHLO-consuming
runtime (XLA, IREE, TF) — plus the weights as an upstream-compatible `.pth`.
"""

from __future__ import annotations

import argparse
import os
import sys

from yolox_tpu.cli.utils import parse_model_config_opts, resolve_config
from yolox_tpu.utils.logger import logger, setup_logger


def make_parser():
    parser = argparse.ArgumentParser("yolox-tpu export")
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("--ckpt", type=str, default=None,
                        help="checkpoint (default: pretrained weights)")
    parser.add_argument("--output", type=str, default="model.stablehlo")
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--tsize", type=int, default=None)
    parser.add_argument("--include-postprocess", action="store_true",
                        help="bake confidence filter + NMS into the "
                             "exported graph")
    parser.add_argument("--conf", type=float, default=0.5)
    parser.add_argument("--max-det", type=int, default=256)
    parser.add_argument("--decode_in_inference", action="store_true",
                        default=True)
    parser.add_argument("--no-decode", dest="decode_in_inference",
                        action="store_false",
                        help="export raw head outputs (use "
                             "demo_postprocess to decode)")
    parser.add_argument("--int8", action="store_true",
                        help="export the int8-PTQ serving graph "
                             "(yolox_tpu/ops/quant.py); the calibration "
                             "table is baked into the artifact as "
                             "constants — requires --calib-images")
    parser.add_argument("--calib-images", nargs="+", default=[],
                        help="image files/globs for int8 activation-"
                             "scale calibration")
    parser.add_argument("-D", dest="opts", action="append", default=[],
                        metavar="KEY=VALUE")
    return parser


def main(argv=None) -> int:
    args = make_parser().parse_args(argv)
    config = resolve_config(args.config)
    config.update(parse_model_config_opts(args.opts))
    if args.tsize is not None:
        config.test_size = (args.tsize, args.tsize)
    setup_logger()

    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from yolox_tpu.models.yolox import YoloxModule
    from yolox_tpu.models.weights import save_pth_params

    if args.ckpt:
        module = YoloxModule.from_config(config)
        from yolox_tpu.utils.checkpoint import load_checkpoint

        module.load_params(load_checkpoint(args.ckpt)["model"])
    else:
        module = YoloxModule.from_pretrained(config.name)

    module.head.decode_in_inference = args.decode_in_inference
    params = module.params

    from yolox_tpu.models.blocks import EVAL_CTX

    ctx = EVAL_CTX
    if args.int8:
        import dataclasses
        import glob as globlib

        import numpy as np
        from PIL import Image

        from yolox_tpu.models.processor import YoloxProcessor

        paths = [p for pat in args.calib_images
                 for p in sorted(globlib.glob(pat))]
        if not paths:
            logger.error("--int8 needs calibration data: pass "
                         "--calib-images FILES/GLOBS")
            return 1
        processor = YoloxProcessor(config)
        batch = processor([Image.open(p) for p in paths])
        qtab = module.calibrate_int8(
            params, jnp.asarray(np.asarray(batch), jnp.float32))
        ctx = dataclasses.replace(EVAL_CTX, int8_qtab=qtab)
        logger.info(f"int8 calibration: {len(paths)} images, "
                    f"{len(qtab)} conv blocks")

    def serve(p, x):
        fpn = module.backbone(p["backbone"], x, ctx, "backbone")
        out = module.head(p["head"], fpn, ctx, "head")
        if args.include_postprocess:
            from yolox_tpu.ops.nms import postprocess_device

            return postprocess_device(
                out.astype(jnp.float32), config.num_classes,
                conf_thre=args.conf, nms_thre=config.nmsthre,
                class_agnostic=False, max_det=args.max_det)
        return out

    x_spec = jax.ShapeDtypeStruct(
        (args.batch_size, config.test_size[0], config.test_size[1], 3),
        jnp.float32)
    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    exported = jax_export.export(jax.jit(serve))(p_spec, x_spec)

    with open(args.output, "wb") as f:
        f.write(exported.serialize())
    weights_path = os.path.splitext(args.output)[0] + "_weights.pth"
    save_pth_params(params, weights_path)
    logger.info(
        f"exported StableHLO to {args.output} "
        f"({os.path.getsize(args.output) / 1e6:.1f} MB) and weights to "
        f"{weights_path}; input (B={args.batch_size}, "
        f"{config.test_size[0]}x{config.test_size[1]}x3 NHWC f32)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
