"""Env-addressed tiny train config for the 2-process full-Trainer test.

`yolox_tpu.cli.train` resolves user configs as importable
`module:ClassName` (reference `yolox/cli/utils.py:7-28`); a subprocess
worker cannot pass a closure, so this class reads its dataset/output
locations from env vars set by the parent test:

    YOLOX_MP_DATA_DIR  — synthetic COCO root (tests/_synthetic_coco.py)
    YOLOX_MP_OUT_DIR   — per-test output dir
"""

import os

from yolox_tpu import YoloxConfig


class MpTrainConfig(YoloxConfig):
    def __init__(self):
        super().__init__("mp_train_e2e")
        self.num_classes = 3
        self.depth, self.width = 0.33, 0.125
        self.input_size = self.test_size = (64, 64)
        self.max_epoch = 1
        self.warmup_epochs = 1
        self.no_aug_epochs = 1       # epoch 0 runs no-aug -> ONE train
        self.eval_interval = 1       # program to compile; eval-in-train
        self.print_interval = 1      # still runs the distributed gather
        self.data_num_workers = 0
        self.save_history_ckpt = False
        self.multiscale_range = 0
        self.test_conf = 1e-4        # random weights must emit detections
        self.data_dir = os.environ["YOLOX_MP_DATA_DIR"]
        self.output_dir = os.environ["YOLOX_MP_OUT_DIR"]

    def get_eval_dataset(self, **kwargs):
        from yolox_tpu.data import CocoDataset, ValTransform

        return CocoDataset(
            data_dir=self.data_dir, json_file=self.train_ann,
            name="train2017", img_size=self.test_size,
            preproc=ValTransform())
