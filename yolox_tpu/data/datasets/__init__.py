from yolox_tpu.data.datasets.coco_classes import COCO_CLASSES
from yolox_tpu.data.datasets.voc_classes import VOC_CLASSES
from yolox_tpu.data.datasets.datasets_wrapper import (
    CacheDataset,
    ConcatDataset,
    Dataset,
    MixConcatDataset,
    cache_read_img,
)
from yolox_tpu.data.datasets.coco import CocoDataset
from yolox_tpu.data.datasets.voc import VocDetection
from yolox_tpu.data.datasets.mosaicdetection import MosaicDetection

__all__ = [
    "COCO_CLASSES",
    "VOC_CLASSES",
    "CacheDataset",
    "ConcatDataset",
    "Dataset",
    "MixConcatDataset",
    "cache_read_img",
    "CocoDataset",
    "VocDetection",
    "MosaicDetection",
]
