from yolox_tpu.core.train_step import (
    TrainState,
    full_params,
    init_train_state,
    make_train_step,
)

__all__ = ["TrainState", "full_params", "init_train_state", "make_train_step"]
