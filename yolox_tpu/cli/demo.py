"""`yolox-tpu demo` — working re-design of the reference demo predictor
(`/root/reference/yolox/cli/demo.py`, dead code there: it imports the
deleted `yolox.exp`). Image / folder / video inference with drawn boxes.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

from yolox_tpu.cli.utils import parse_model_config_opts, resolve_config
from yolox_tpu.utils.logger import logger, setup_logger

IMAGE_EXT = (".jpg", ".jpeg", ".webp", ".bmp", ".png")


def make_parser():
    parser = argparse.ArgumentParser("yolox-tpu demo")
    parser.add_argument("demo_type", default="image", nargs="?",
                        choices=["image", "video"],
                        help="demo type")
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("--path", type=str, required=True,
                        help="image file / directory / video file")
    parser.add_argument("--ckpt", type=str, default=None,
                        help="checkpoint (default: pretrained weights)")
    parser.add_argument("--conf", type=float, default=0.25)
    parser.add_argument("--nms", type=float, default=None)
    parser.add_argument("--tsize", type=int, default=None)
    parser.add_argument("--save_result", action="store_true")
    parser.add_argument("--batch", type=int, default=1,
                        help="images per device batch for the pipelined "
                             "stream (throughput knob; latency prefers 1)")
    parser.add_argument("--output-dir", type=str, default="./yolox_outputs")
    parser.add_argument("--fp16", action="store_true")
    parser.add_argument("--int8", action="store_true",
                        help="int8 PTQ inference, calibrated on the first "
                             "input image/frame (yolox_tpu/ops/quant.py)")
    parser.add_argument("-D", dest="opts", action="append", default=[],
                        metavar="KEY=VALUE")
    return parser


def _load_model(config, args):
    import jax.numpy as jnp

    from yolox_tpu.models.processor import YoloxProcessor
    from yolox_tpu.models.yolox import Yolox, YoloxModule

    dtype = jnp.bfloat16 if args.fp16 else jnp.float32
    if args.ckpt:
        module = YoloxModule.from_config(config, dtype=dtype)
        from yolox_tpu.utils.checkpoint import load_checkpoint

        module.load_params(load_checkpoint(args.ckpt)["model"])
    else:
        module = YoloxModule.from_pretrained(config.name, dtype=dtype)
    return Yolox(module, YoloxProcessor(config))


def _calibrate_int8(model, args):
    """Calibrate the int8 activation table on the first input and switch
    the wrapper's fused serving path to the quantized graph."""
    import jax.numpy as jnp
    import numpy as np

    path = Path(args.path)
    if args.demo_type == "image":
        from PIL import Image

        first = (path if path.is_file() else next(iter(sorted(
            p for p in path.rglob("*") if p.suffix.lower() in IMAGE_EXT))))
        images = [Image.open(first)]
    else:
        import cv2

        cap = cv2.VideoCapture(args.path)
        ret, frame = cap.read()
        cap.release()
        if not ret:
            # Hard failure: silently serving the float graph after the
            # user asked for --int8 would misreport every downstream
            # number as quantized.
            raise RuntimeError(
                f"--int8: could not read a calibration frame from "
                f"{args.path}")
        images = [frame[:, :, ::-1]]
        from PIL import Image

        images = [Image.fromarray(np.ascontiguousarray(images[0]))]
    batch = model.processor(images)
    model.int8_qtab = model.module.calibrate_int8(
        model.module.params, jnp.asarray(np.asarray(batch), jnp.float32))
    logger.info(f"int8 calibration on {args.path}: "
                f"{len(model.int8_qtab)} conv blocks")


def _draw(image_bgr, dets, conf, class_names):
    import numpy as np

    from yolox_tpu.utils.visualize import vis

    boxes = np.asarray(dets["bboxes"], np.float32).reshape(-1, 4)
    scores = np.asarray(dets["scores"], np.float32)
    labels = np.asarray(dets["labels"], np.int64)
    return vis(image_bgr, boxes, scores, labels, conf=conf,
               class_names=class_names)


def demo_images(model, args, class_names):
    import cv2
    from PIL import Image

    path = Path(args.path)
    files = ([path] if path.is_file() else sorted(
        p for p in path.rglob("*") if p.suffix.lower() in IMAGE_EXT))
    out_dir = Path(args.output_dir)
    if args.save_result:
        out_dir.mkdir(parents=True, exist_ok=True)

    # pipelined stream: decode/letterbox of the next batch overlaps the
    # device inference of the current one (Yolox.stream). Per-image
    # wall-clock is not attributable inside a pipeline (a batch's device
    # time surfaces at its first yield, save work bills to the next), so
    # the honest number is the end-to-end mean reported at the end.
    t0 = time.time()
    count = 0
    for f, dets in zip(files, model.stream(
            (Image.open(f) for f in files), threshold=args.conf,
            batch_size=args.batch)):
        count += 1
        logger.info(f"{f.name}: {len(dets['labels'])} objects")
        if args.save_result:
            img = cv2.imread(str(f))
            img = _draw(img, dets, args.conf, class_names)
            out = out_dir / f.name
            cv2.imwrite(str(out), img)
            logger.info(f"saved {out}")
    if count:
        total = time.time() - t0
        logger.info(f"{count} images in {total:.2f} s "
                    f"({total * 1000 / count:.1f} ms/image end-to-end, "
                    f"incl. decode/draw/save)")


def demo_video(model, args, class_names):
    import cv2
    import numpy as np

    cap = cv2.VideoCapture(args.path)
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 25
    writer = None
    if args.save_result:
        out_dir = Path(args.output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        out_path = str(out_dir / Path(args.path).name)
        writer = cv2.VideoWriter(
            out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
            (width, height))
        logger.info(f"writing to {out_path}")
    # Pipelined stream: frame decode + letterbox of upcoming frames
    # overlaps device inference of the in-flight batch (Yolox.stream).
    # Frames are retained in a FIFO until their detections come back —
    # the stream runs at most one batch ahead, bounding the queue to
    # ~2 * batch frames.
    from collections import deque

    in_flight = deque()

    def frames():
        while True:
            ret, frame = cap.read()
            if not ret:
                return
            in_flight.append(frame)
            yield frame[:, :, ::-1]  # model expects RGB (PIL convention)

    n = 0
    for dets in model.stream(frames(), threshold=args.conf,
                             batch_size=args.batch):
        frame = in_flight.popleft()
        n += 1
        if writer is not None:
            writer.write(_draw(frame, dets, args.conf, class_names))
    cap.release()
    if writer is not None:
        writer.release()
    logger.info(f"processed {n} frames")


def main(argv=None) -> int:
    args = make_parser().parse_args(argv)
    config = resolve_config(args.config)
    config.update(parse_model_config_opts(args.opts))
    if args.nms is not None:
        config.nmsthre = args.nms
    if args.tsize is not None:
        config.test_size = (args.tsize, args.tsize)

    setup_logger()
    from yolox_tpu.data.datasets import COCO_CLASSES

    class_names = (COCO_CLASSES if config.num_classes == len(COCO_CLASSES)
                   else tuple(str(i) for i in range(config.num_classes)))
    model = _load_model(config, args)
    if args.int8:
        _calibrate_int8(model, args)
    if args.demo_type == "image":
        demo_images(model, args, class_names)
    else:
        demo_video(model, args, class_names)
    return 0


if __name__ == "__main__":
    sys.exit(main())
