from yolox_tpu.ops.boxes import (
    bboxes_iou,
    cxcywh2xyxy,
    pairwise_iou_xyxy,
    xyxy2cxcywh,
    xyxy2xywh,
)
from yolox_tpu.ops.nms import batched_nms_fixed, nms_fixed, postprocess_device
from yolox_tpu.ops.preproc import preproc

__all__ = [
    "bboxes_iou",
    "cxcywh2xyxy",
    "pairwise_iou_xyxy",
    "xyxy2cxcywh",
    "xyxy2xywh",
    "batched_nms_fixed",
    "nms_fixed",
    "postprocess_device",
    "preproc",
]
