"""Env-addressed tiny train config for the preemption-checkpoint test.

Resolved by `yolox_tpu.cli.train` as `module:ClassName`; the subprocess
reads its dataset/output locations from env vars set by the parent test
(same pattern as `tests/_mp_train_config.py`):

    YOLOX_PRE_DATA_DIR  — synthetic COCO root (tests/_synthetic_coco.py)
    YOLOX_PRE_OUT_DIR   — per-test output dir

Many epochs + no eval: SIGTERM must land mid-training, and the run must
not end on its own before the parent sends it.
"""

import os

from yolox_tpu import YoloxConfig


class PreemptTrainConfig(YoloxConfig):
    def __init__(self):
        super().__init__("preempt_e2e")
        self.num_classes = 3
        self.depth, self.width = 0.33, 0.125
        self.input_size = self.test_size = (64, 64)
        self.max_epoch = 1000           # far more than the test waits for
        self.warmup_epochs = 1
        self.no_aug_epochs = 0          # never hit the no-aug switch (it
                                        # forces eval_interval=1 -> slow)
        self.eval_interval = 10**6      # never evaluate
        self.print_interval = 1
        self.data_num_workers = 0
        self.save_history_ckpt = False
        self.multiscale_range = 0
        self.data_dir = os.environ["YOLOX_PRE_DATA_DIR"]
        self.output_dir = os.environ["YOLOX_PRE_OUT_DIR"]

    def get_eval_dataset(self, **kwargs):
        # the trainer builds its evaluator up front even though this run
        # never evaluates; synthetic COCO only has train annotations
        from yolox_tpu.data import CocoDataset, ValTransform

        return CocoDataset(
            data_dir=self.data_dir, json_file=self.train_ann,
            name="train2017", img_size=self.test_size,
            preproc=ValTransform())
