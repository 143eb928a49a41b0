"""Test configuration: run on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes — this conftest is imported before
any test module.
"""

import os

# NOTE: the surrounding environment exports JAX_PLATFORMS=axon (a tunneled
# TPU) and plugin init can rewrite the env var, so an env override alone is
# unreliable — set the config explicitly after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import json  # noqa: E402
import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

TESTS_DIR = pathlib.Path(__file__).parent
GOLDEN_DIR = TESTS_DIR / "golden"


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN_DIR


N_IMAGES = 12
IMG_SIZE = (96, 128)  # (h, w) varied per image below


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("coco")
    (root / "annotations").mkdir()
    (root / "train2017").mkdir()

    rng = np.random.default_rng(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(N_IMAGES):
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
