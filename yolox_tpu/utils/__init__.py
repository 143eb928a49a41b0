from yolox_tpu.utils.checkpoint import (
    load_checkpoint,
    load_ckpt,
    save_checkpoint,
)
from yolox_tpu.utils.ema import ema_update, init_ema
from yolox_tpu.utils.logger import logger, setup_logger
from yolox_tpu.utils.lr_scheduler import LRScheduler
from yolox_tpu.utils.metric import AverageMeter, MeterBuffer
from yolox_tpu.utils.model_utils import (
    adjust_status,
    count_params,
    freeze_mask,
    fuse_model_params,
    get_model_info,
)

__all__ = [
    "load_checkpoint",
    "load_ckpt",
    "save_checkpoint",
    "ema_update",
    "init_ema",
    "logger",
    "setup_logger",
    "LRScheduler",
    "AverageMeter",
    "MeterBuffer",
    "adjust_status",
    "count_params",
    "freeze_mask",
    "fuse_model_params",
    "get_model_info",
]
