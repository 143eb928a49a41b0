#!/usr/bin/env python
"""Run the WHOLE eval lane at reference scale (COCO val2017 = 5 000 images)
on synthetic data — dataloader -> pipelined batched inference -> COCO
conversion -> COCOeval (native C++ match + vectorized accumulate) ->
per-class tables — and record wall time per stage, peak host RSS, device
memory, and throughput.

The reference's evaluator was proven on the real val2017
(`/root/reference/yolox/evaluators/coco_evaluator.py:114-186`, ~5k images
/ ~90k detections); this script is the offline equivalent: an end-to-end
scale exercise of the identical code path (`yolox_tpu.cli.eval.run_eval`)
that catches memory blowups, compile-count surprises, and throughput
cliffs that 30-image tests cannot. Results land in
docs/eval_at_scale.md.

Usage (on the TPU chip):
  python scripts/eval_at_scale.py [--images 5000] [--model s] [--batch 64]
      [--root /tmp/yolox_eval5k] [--conf 2e-5] [--int8]

The dataset is built once and cached under --root: 80 COCO-named
categories, image sizes drawn from typical COCO dimensions, ~7 boxes per
image (val2017 averages ~7.4), drawn as filled rectangles so JPEGs stay
small and the random-weight model's detections are non-degenerate. The
default --conf is tuned so a random-init model (score ~= bias prior 1e-4
scale) emits tens of detections per image -> ~10^5 total, matching the
reference's detection volume.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# typical COCO val2017 dimension mix
_SIZES = [(480, 640), (640, 480), (426, 640), (640, 427), (612, 612),
          (375, 500), (640, 426), (500, 375), (429, 640), (640, 640)]


def build_dataset(root: pathlib.Path, n_images: int, seed: int = 0) -> None:
    import cv2

    ann_file = root / "annotations" / "instances_val2017.json"
    marker = root / f".complete_{n_images}"
    if marker.exists():
        return
    (root / "annotations").mkdir(parents=True, exist_ok=True)
    (root / "val2017").mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(seed)
    # real COCO category ids are non-contiguous (1..90 with gaps) — keep
    # that property so the category-id mapping in the evaluator is
    # genuinely exercised (`evaluators/coco_evaluator.py` id translation)
    cat_ids = [c for c in range(1, 91) if c % 9 != 0][:80]
    images, annotations = [], []
    ann_id = 1
    t0 = time.time()
    for i in range(n_images):
        h, w = _SIZES[int(rng.integers(len(_SIZES)))]
        img = np.full((h, w, 3), int(rng.integers(40, 216)), np.uint8)
        name = f"{i:012d}.jpg"
        exists = (root / "val2017" / name).exists()
        n_boxes = int(rng.poisson(7)) or 1
        for _ in range(n_boxes):
            bw = float(rng.uniform(8, w * 0.7))
            bh = float(rng.uniform(8, h * 0.7))
            x = float(rng.uniform(0, w - bw))
            y = float(rng.uniform(0, h - bh))
            color = tuple(int(c) for c in rng.integers(0, 255, 3))
            cv2.rectangle(img, (int(x), int(y)), (int(x + bw), int(y + bh)),
                          color, -1)
            annotations.append({
                "id": ann_id, "image_id": i,
                "category_id": int(cat_ids[int(rng.integers(80))]),
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
            })
            ann_id += 1
        if not exists:
            cv2.imwrite(str(root / "val2017" / name), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 70])
        images.append({"id": i, "width": w, "height": h, "file_name": name})
        if i % 1000 == 999:
            print(f"  built {i + 1}/{n_images} images "
                  f"({time.time() - t0:.0f}s)", flush=True)
    from yolox_tpu.data import COCO_CLASSES

    categories = [{"id": cid, "name": COCO_CLASSES[j]}
                  for j, cid in enumerate(cat_ids)]
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": categories}, f)
    marker.touch()
    print(f"dataset ready: {n_images} images, {len(annotations)} gt boxes, "
          f"{time.time() - t0:.0f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=5000)
    ap.add_argument("--model", default="s")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--root", default="/tmp/yolox_eval5k")
    ap.add_argument("--conf", type=float, default=2e-5)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--ckpt-dir", default="/tmp/yolox_eval5k_ckpt")
    args = ap.parse_args()

    root = pathlib.Path(args.root)
    build_dataset(root, args.images)

    import jax

    from yolox_tpu import YoloxConfig, YoloxModule
    from yolox_tpu.models.weights import save_pth_params

    config = YoloxConfig.get_named_config(f"yolox_{args.model}")
    config.data_dir = str(root)
    config.test_conf = args.conf

    # random-weight checkpoint through the real .pth save/load path
    ckpt_dir = pathlib.Path(args.ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    ckpt_file = ckpt_dir / f"random_{args.model}.pth"
    if not ckpt_file.exists():
        module = YoloxModule.from_config(config, rng_seed=0)
        save_pth_params(module.params, str(ckpt_file))

    from yolox_tpu.cli import eval as eval_cli

    stamps = {"start": time.time()}
    argv = ["-c", f"yolox_{args.model}", "--ckpt", str(ckpt_file),
            "-b", str(args.batch), "--fp16", "--conf", str(args.conf),
            "-D", f"data_dir={root}"]
    if args.int8:
        argv += ["--int8"]

    rc = eval_cli.main(argv)
    stamps["end"] = time.time()

    dev = jax.local_devices()[0]
    mem = getattr(dev, "memory_stats", lambda: {})() or {}
    report = {
        "images": args.images,
        "model": args.model,
        "batch": args.batch,
        "wall_s": round(stamps["end"] - stamps["start"], 1),
        "img_per_s_end_to_end": round(
            args.images / (stamps["end"] - stamps["start"]), 1),
        "peak_host_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
        "device_peak_bytes": mem.get("peak_bytes_in_use"),
        "rc": rc,
    }
    print("EVAL_AT_SCALE " + json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
