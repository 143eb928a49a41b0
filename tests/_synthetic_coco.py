"""Deterministic synthetic COCO dataset + tiny eval config, shared by the
single-process fixtures (`conftest.coco_dir`) and the multi-process eval
worker (which must rebuild identical inputs in a separate interpreter).
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

N_IMAGES = 12
IMG_SIZE = (96, 128)  # (h, w) varied per image below


def build_synthetic_coco(root, n_images: int = N_IMAGES) -> str:
    """Write a small deterministic COCO-format dataset under `root`."""
    import cv2

    root = pathlib.Path(root)
    (root / "annotations").mkdir(parents=True, exist_ok=True)
    (root / "train2017").mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        h = int(IMG_SIZE[0] + 8 * (i % 3))
        w = int(IMG_SIZE[1] - 8 * (i % 2))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        name = f"{i:012d}.jpg"
        cv2.imwrite(str(root / "train2017" / name), np.asarray(img))
        images.append({"id": i, "width": w, "height": h, "file_name": name})
        for _ in range(int(rng.integers(1, 4))):
            bw = float(rng.uniform(10, w / 2))
            bh = float(rng.uniform(10, h / 2))
            x = float(rng.uniform(0, w - bw))
            y = float(rng.uniform(0, h - bh))
            annotations.append({
                "id": ann_id, "image_id": i,
                "category_id": int(rng.choice([1, 3, 7])),
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
            })
            ann_id += 1
    categories = [{"id": c, "name": f"cat{c}"} for c in (1, 3, 7)]
    with open(root / "annotations" / "instances_train2017.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": categories}, f)
    return str(root)


def build_learnable_coco(root, n_images: int = 16, img_size: int = 96):
    """A synthetic dataset with VISIBLE signal: dark background + one solid
    bright rectangle per image, class determined by color. Unlike
    `build_synthetic_coco` (noise images, only memorizable), a detector can
    genuinely learn these, so training-outcome tests (loss convergence,
    confident detections) are meaningful."""
    import cv2

    root = pathlib.Path(root)
    (root / "annotations").mkdir(parents=True, exist_ok=True)
    (root / "train2017").mkdir(parents=True, exist_ok=True)

    # class -> BGR fill (far apart in hue so HSV jitter can't alias them)
    palette = {1: (40, 40, 230), 3: (40, 230, 40), 7: (230, 160, 40)}
    cat_ids = sorted(palette)
    rng = np.random.default_rng(7)
    images, annotations = [], []
    for i in range(n_images):
        h = w = img_size
        img = np.full((h, w, 3), 30, np.uint8)
        img += rng.integers(0, 12, (h, w, 3), dtype=np.uint8)  # mild texture
        cat = cat_ids[i % len(cat_ids)]
        bw = float(rng.uniform(0.35, 0.55) * w)
        bh = float(rng.uniform(0.35, 0.55) * h)
        x = float(rng.uniform(0.05 * w, w - bw - 0.05 * w))
        y = float(rng.uniform(0.05 * h, h - bh - 0.05 * h))
        cv2.rectangle(img, (int(x), int(y)), (int(x + bw), int(y + bh)),
                      palette[cat], thickness=-1)
        name = f"{i:012d}.jpg"
        cv2.imwrite(str(root / "train2017" / name), img)
        images.append({"id": i, "width": w, "height": h, "file_name": name})
        annotations.append({
            "id": i + 1, "image_id": i, "category_id": cat,
            "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
        })
    categories = [{"id": c, "name": f"cat{c}"} for c in cat_ids]
    with open(root / "annotations" / "instances_train2017.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": categories}, f)
    return str(root)


def make_tiny_eval_config(data_dir: str):
    """A 3-class tiny config over the synthetic dataset. The low test_conf
    makes a random-weight model produce real detections, so the evaluator
    comparison is non-vacuous."""
    from yolox_tpu import YoloxConfig

    class TinyMpEval(YoloxConfig):
        def __init__(self):
            super().__init__("tiny_mp_eval")
            self.num_classes = 3
            self.depth, self.width = 0.33, 0.125
            self.input_size = self.test_size = (64, 64)
            self.data_dir = data_dir
            self.val_ann = "instances_train2017.json"
            self.data_num_workers = 0
            self.test_conf = 1e-4

        def get_eval_dataset(self, **kw):
            from yolox_tpu.data import CocoDataset, ValTransform

            return CocoDataset(
                data_dir=self.data_dir, json_file=self.val_ann,
                name="train2017", img_size=self.test_size,
                preproc=ValTransform())

    return TinyMpEval()
