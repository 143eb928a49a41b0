from yolox_tpu.core.train_step import (
    TrainState,
    full_params,
    init_train_state,
    make_augmented_train_step,
    make_pipelined_train_step,
    make_train_step,
)
from yolox_tpu.core.trainer import Trainer

__all__ = ["TrainState", "full_params", "init_train_state",
           "make_augmented_train_step", "make_pipelined_train_step",
           "make_train_step", "Trainer"]
