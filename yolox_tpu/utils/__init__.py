from yolox_tpu.utils.lr_scheduler import LRScheduler
from yolox_tpu.utils.metric import AverageMeter, MeterBuffer
from yolox_tpu.utils.logger import setup_logger

__all__ = ["LRScheduler", "AverageMeter", "MeterBuffer", "setup_logger"]
