"""Golden-value inference test — analog of the reference's primary oracle
(`/root/reference/tests/test_detections.py`).

Runs all named models on the reference's three real COCO images and compares
against the reference's own hardcoded expected detections (loaded from the
reference test module — no copying), with the reference tolerances
(boxes 1e-2, scores 1e-4, labels exact).

Requires the upstream pretrained checkpoints, which cannot be downloaded in
offline environments: the test self-skips per model unless
`$YOLOX_HOME/weights/<model>.pth` exists.
"""

import glob
import importlib.util
import os
from pathlib import Path

import numpy as np
import pytest

from tests._reference_oracle import REFERENCE_PATH, reference_available

WEIGHTS_DIR = Path(
    os.environ.get("YOLOX_HOME", str(Path.home() / ".cache" / "yolox"))
) / "weights"
IMAGES = sorted(glob.glob("/root/reference/tests/data/*.jpg"))

MODELS = ["yolox_nano", "yolox_tiny", "yolox_s", "yolox_m", "yolox_l",
          "yolox_x"]


def _load_reference_expectations():
    """Import DETECTIONS_DATA from the reference test module (data table,
    not code)."""
    path = REFERENCE_PATH / "tests" / "test_detections.py"
    spec = importlib.util.spec_from_file_location("_ref_detections", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.DETECTIONS_DATA


@pytest.mark.parametrize("model_name", MODELS)
def test_pretrained_detections(model_name):
    if not reference_available():
        pytest.skip("/root/reference not available")
    ckpt = WEIGHTS_DIR / f"{model_name}.pth"
    if not ckpt.exists():
        pytest.skip(f"pretrained weights not cached at {ckpt}")

    from PIL import Image

    from yolox_tpu import Yolox

    expectations = _load_reference_expectations()[model_name]
    model = Yolox.from_pretrained(model_name)
    images = [Image.open(p) for p in IMAGES]
    results = model(images, threshold=0.5)

    assert len(results) == len(expectations)
    for result, expected in zip(results, expectations):
        assert result["labels"] == expected["labels"]
        np.testing.assert_allclose(
            np.array(result["scores"]), np.array(expected["scores"]),
            atol=1e-4)
        np.testing.assert_allclose(
            np.array(result["bboxes"]), np.array(expected["bboxes"]),
            atol=1e-2)
