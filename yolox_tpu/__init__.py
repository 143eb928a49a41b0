"""pixeltable-yolox-tpu: a TPU-native YOLOX object detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of pixeltable-yolox
(reference: /root/reference). The public API mirrors the reference
(`yolox/models/yolox.py:22-52`, `yolox/models/processor.py:13-60`):

    from yolox_tpu import Yolox
    model = Yolox.from_pretrained("yolox_s")
    detections = model(["image.jpg"], threshold=0.5)

Compute runs as jitted XLA graphs on TPU (NHWC layouts, bf16 fast path,
on-device NMS); training is data-parallel over a `jax.sharding.Mesh`.
"""

from yolox_tpu.version import __version__

from yolox_tpu.config import (
    YoloxConfig,
    YoloxS,
    YoloxM,
    YoloxL,
    YoloxX,
    YoloxTiny,
    YoloxNano,
    Yolov3,
)
from yolox_tpu.models.yolox import Yolox, YoloxModule
from yolox_tpu.models.processor import Detections, YoloxProcessor

__all__ = [
    "__version__",
    "YoloxConfig",
    "YoloxS",
    "YoloxM",
    "YoloxL",
    "YoloxX",
    "YoloxTiny",
    "YoloxNano",
    "Yolov3",
    "Yolox",
    "YoloxModule",
    "YoloxProcessor",
    "Detections",
]
