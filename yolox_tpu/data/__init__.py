from yolox_tpu.data.data_augment import TrainTransform, ValTransform
from yolox_tpu.data.dataloading import (
    DataLoader,
    DevicePrefetcher,
    get_yolox_datadir,
)
from yolox_tpu.data.samplers import (
    InfiniteSampler,
    SequentialBatchSampler,
    YoloBatchSampler,
)
from yolox_tpu.data.datasets import (
    COCO_CLASSES,
    CacheDataset,
    CocoDataset,
    ConcatDataset,
    Dataset,
    MixConcatDataset,
    MosaicDetection,
    VOC_CLASSES,
    VocDetection,
)

__all__ = [
    "TrainTransform",
    "ValTransform",
    "DataLoader",
    "DevicePrefetcher",
    "get_yolox_datadir",
    "InfiniteSampler",
    "SequentialBatchSampler",
    "YoloBatchSampler",
    "COCO_CLASSES",
    "CacheDataset",
    "CocoDataset",
    "ConcatDataset",
    "Dataset",
    "MixConcatDataset",
    "MosaicDetection",
    "VOC_CLASSES",
    "VocDetection",
]
