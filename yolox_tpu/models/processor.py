"""YoloxProcessor — re-design of `/root/reference/yolox/models/processor.py`.

Pre: per-image letterbox to `config.test_size` (pad 114 top-left, no
normalization, RGB channel order as produced by `np.array(PIL)` — the
reference feeds RGB with no BGR swap, `processor.py:35`; we preserve that
behavior for checkpoint parity). Output is an NHWC float32 batch.

Post: on-device confidence filter + class-aware NMS
(`yolox_tpu/ops/nms.py`), then rescale by 1/letterbox-ratio;
score = obj_conf * cls_conf; returns `Detections` TypedDicts.
"""

from __future__ import annotations

from typing import Iterable, List, TypedDict, Union

import numpy as np

from yolox_tpu.config import YoloxConfig
from yolox_tpu.ops.preproc import letterbox_ratio, preproc


class Detections(TypedDict):
    bboxes: List[tuple]
    scores: List[float]
    labels: List[int]


class YoloxProcessor:
    config: YoloxConfig

    def __init__(self, model_name_or_config: Union[str, YoloxConfig]):
        if isinstance(model_name_or_config, str):
            config = YoloxConfig.get_named_config(model_name_or_config)
            if config is None:
                raise ValueError(
                    f"Unknown model: {model_name_or_config}")
            self.config = config
        elif isinstance(model_name_or_config, YoloxConfig):
            self.config = model_name_or_config
        else:
            raise ValueError(
                "model_name_or_config must be a string or YoloxConfig")

    def __call__(self, inputs: Iterable) -> np.ndarray:
        """PIL images (or HWC arrays) -> letterboxed NHWC float32 batch."""
        tensors = []
        for image in inputs:
            arr = np.asarray(image)
            image_t, _ = preproc(arr, self.config.test_size)
            tensors.append(image_t)
        return np.stack(tensors)

    def postprocess(self, images: Iterable, tensor,
                    threshold: float = 0.5) -> List[Detections]:
        from yolox_tpu.ops.nms import postprocess_device

        dets, valid = postprocess_device(
            tensor,
            self.config.num_classes,
            conf_thre=threshold,
            nms_thre=self.config.nmsthre,
            class_agnostic=False,
        )
        return self.postprocess_dets(images, np.asarray(dets),
                                     np.asarray(valid))

    def postprocess_dets(self, images: Iterable, dets: np.ndarray,
                         valid: np.ndarray) -> List[Detections]:
        """Rescale fixed-shape device detections (from `postprocess_device`
        or the fused `YoloxModule.serve`) into Detections dicts."""
        results: List[Detections] = []
        for i, image in enumerate(images):
            if hasattr(image, "height"):
                h, w = image.height, image.width
            else:
                h, w = np.asarray(image).shape[:2]
            ratio = letterbox_ratio((h, w), self.config.test_size)
            rows = dets[i][valid[i]]
            results.append(
                Detections(
                    bboxes=[tuple((row[:4] / ratio).tolist()) for row in rows],
                    scores=[float(row[4]) * float(row[5]) for row in rows],
                    labels=[int(row[6]) for row in rows],
                )
            )
        return results
