"""Load the reference torch implementation (/root/reference) as a parity oracle.

The reference depends on torchvision / loguru / pycocotools which are absent
in this environment; we install minimal stubs *before* importing it. Only the
model-forward code paths are exercised — none of the stubbed functionality.

Parity tests are skipped automatically when the reference tree is absent
(the framework itself has zero dependency on it).
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REFERENCE_PATH = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE_PATH / "yolox" / "__init__.py").exists()


_loaded = None


def _install_stubs():
    import torch

    def _nms_torch(boxes, scores, iou_threshold):
        """torchvision.ops.nms semantics: sort desc, suppress iou > thr."""
        order = torch.argsort(scores, descending=True, stable=True)
        boxes_s = boxes[order]
        n = boxes_s.shape[0]
        keep_mask = torch.ones(n, dtype=torch.bool)
        x1, y1, x2, y2 = boxes_s.unbind(1)
        areas = (x2 - x1) * (y2 - y1)
        for i in range(n):
            if not keep_mask[i]:
                continue
            xx1 = torch.maximum(x1[i], x1[i + 1:])
            yy1 = torch.maximum(y1[i], y1[i + 1:])
            xx2 = torch.minimum(x2[i], x2[i + 1:])
            yy2 = torch.minimum(y2[i], y2[i + 1:])
            w = (xx2 - xx1).clamp(min=0)
            h = (yy2 - yy1).clamp(min=0)
            inter = w * h
            iou = inter / (areas[i] + areas[i + 1:] - inter)
            keep_mask[i + 1:] &= ~(iou > iou_threshold)
        return order[keep_mask]

    def _batched_nms_torch(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.empty((0,), dtype=torch.int64)
        max_coordinate = boxes.max()
        offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1).to(boxes))
        return _nms_torch(boxes + offsets[:, None], scores, iou_threshold)

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        ops.nms = _nms_torch
        ops.batched_nms = _batched_nms_torch
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops

    if "loguru" not in sys.modules:
        import logging

        loguru = types.ModuleType("loguru")

        class _Logger:
            def __getattr__(self, name):
                return getattr(logging.getLogger("loguru-stub"), name,
                               lambda *a, **k: None)

        loguru.logger = _Logger()
        sys.modules["loguru"] = loguru

    if "pycocotools" not in sys.modules:
        pct = types.ModuleType("pycocotools")
        coco_mod = types.ModuleType("pycocotools.coco")

        class COCO:  # noqa: N801 - matching upstream name
            def __init__(self, *a, **k):
                raise RuntimeError("pycocotools stub: not usable in tests")

        coco_mod.COCO = COCO
        pct.coco = coco_mod
        sys.modules["pycocotools"] = pct
        sys.modules["pycocotools.coco"] = coco_mod


def load_reference():
    """Import and return the reference `yolox` package (cached)."""
    global _loaded
    if _loaded is not None:
        return _loaded
    if not reference_available():
        raise RuntimeError("reference tree not available")
    _install_stubs()
    # The reference __init__ reads its own installed-package version, which
    # isn't installed here.
    import importlib.metadata as _md

    _orig_version = _md.version

    def _version(name):
        if name == "pixeltable-yolox":
            return "0.4.1"
        return _orig_version(name)

    _md.version = _version
    sys.path.insert(0, str(REFERENCE_PATH))
    try:
        import yolox as ref_yolox  # noqa: F401
        import yolox.models  # noqa: F401
        import yolox.config  # noqa: F401
    finally:
        sys.path.pop(0)
        _md.version = _orig_version
    _loaded = sys.modules["yolox"]
    return _loaded
