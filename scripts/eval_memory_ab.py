#!/usr/bin/env python
"""A/B the host-memory footprint of the detections representation.

The eval-at-scale run (`scripts/eval_at_scale.py`, 5 000 synthetic
images, 5.12M detections) peaked at 28.9 GB host RSS in round 4 —
attributed to the COCO-protocol per-detection dict path the reference
shares (`/root/reference/yolox/evaluators/coco_evaluator.py:205-251`:
one python dict per detection through json/loadRes/COCOeval). Round 5
adds a columnar path (flat numpy arrays end-to-end:
`convert_to_coco_columnar` -> `coco_json.loadRes` columnar ->
`cocoeval._dt_columnar`); this script measures both representations
through the memory-dominant phase (conversion -> loadRes -> evaluate ->
accumulate) at the same synthetic volume, each leg in a fresh
subprocess so peak RSS is clean.

Usage: python scripts/eval_memory_ab.py [--dets 5120000] [--images 5000]
Device-free (pure host phase). Results land in docs/eval_at_scale.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD = r"""
import json, resource, sys, time
import numpy as np

sys.path.insert(0, {repo!r})
from yolox_tpu.data.coco_json import COCO
from yolox_tpu.evaluators.cocoeval import COCOeval

mode, n_dets, n_images = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
rng = np.random.default_rng(0)
cats = list(range(1, 81))

gt = COCO()
gt.dataset = {{
    "images": [{{"id": i, "width": 640, "height": 480}}
               for i in range(n_images)],
    "categories": [{{"id": c, "name": str(c)}} for c in cats],
    "annotations": [],
}}
anns = []
for i in range(n_images):
    for _ in range(7):
        w, h = rng.uniform(8, 300, 2)
        x, y = rng.uniform(0, 640 - w), rng.uniform(0, 480 - h)
        anns.append({{"id": len(anns) + 1, "image_id": i,
                     "category_id": int(rng.choice(cats)),
                     "bbox": [float(x), float(y), float(w), float(h)],
                     "area": float(w * h), "iscrowd": 0}})
gt.dataset["annotations"] = anns
gt.create_index()

# synthetic detections, ~uniform over images/categories
img_id = rng.integers(0, n_images, n_dets).astype(np.int64)
cat_id = rng.integers(1, 81, n_dets).astype(np.int64)
w = rng.uniform(8, 300, n_dets); h = rng.uniform(8, 300, n_dets)
x = rng.uniform(0, 640 - w); y = rng.uniform(0, 480 - h)
bbox = np.stack([x, y, w, h], 1)
score = rng.uniform(1e-5, 1.0, n_dets)

t0 = time.time()
if mode == "dict":
    res = [{{"image_id": int(img_id[i]), "category_id": int(cat_id[i]),
            "bbox": bbox[i].tolist(), "score": float(score[i]),
            "segmentation": []}} for i in range(n_dets)]
else:
    res = {{"image_id": img_id, "category_id": cat_id,
           "bbox": bbox, "score": score}}
t_conv = time.time() - t0

t0 = time.time()
dt = gt.loadRes(res)
ev = COCOeval(gt, dt, "bbox")
ev.evaluate()
ev.accumulate()
import contextlib, io
with contextlib.redirect_stdout(io.StringIO()):
    ev.summarize()
t_eval = time.time() - t0

print(json.dumps({{
    "mode": mode, "n_dets": n_dets, "n_images": n_images,
    "ap": round(float(ev.stats[0]), 6),
    "convert_s": round(t_conv, 2), "eval_s": round(t_eval, 2),
    "peak_host_rss_gb": round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
}}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dets", type=int, default=5_120_000)
    ap.add_argument("--images", type=int, default=5_000)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = _CHILD.format(repo=repo)
    for mode in ("columnar", "dict"):
        out = subprocess.run(
            [sys.executable, "-c", child, mode, str(args.dets),
             str(args.images)],
            capture_output=True, text=True)
        line = (out.stdout.strip().splitlines() or ["{}"])[-1]
        if out.returncode != 0:
            line = json.dumps({"mode": mode, "error": out.stderr[-400:]})
        print(line, flush=True)


if __name__ == "__main__":
    main()
