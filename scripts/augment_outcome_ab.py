#!/usr/bin/env python
"""Device-augment vs host-augment TRAINING-OUTCOME A/B.

The device augmentation engine (`yolox_tpu/data/device_augment.py`) was
equivalence-tested distributionally (per-metric z-scores vs the host
cv2 pipeline, `tests/test_augment_equivalence.py`); this script upgrades
the evidence to OUTCOME level: two full Trainer runs on the same tiny
synthetic COCO set — one with the reference-semantics host pipeline
(MosaicDetection + cv2 affine/HSV), one with `device_augment=True`
(mosaic/affine/mixup/HSV/flip fused into the train step) — then the
same COCO-mAP evaluation of both final checkpoints on the training
images. Both runs must converge to confident detections; the mAP/loss
deltas are the recorded outcome gap.

Semantics owner: `/root/reference/yolox/data/datasets/mosaicdetection.py:76-158`.

Usage:  python scripts/augment_outcome_ab.py [--epochs 150] [--out /tmp/aug_ab]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def make_config(data_dir: str, out_dir: str, epochs: int, device_aug: bool):
    from yolox_tpu import YoloxConfig

    class AbConfig(YoloxConfig):
        def __init__(self):
            super().__init__(
                "aug_ab_" + ("device" if device_aug else "host"))
            self.num_classes = 3
            self.depth, self.width = 0.33, 0.125
            self.input_size = self.test_size = (64, 64)
            self.max_epoch = epochs
            self.warmup_epochs = 2
            self.no_aug_epochs = max(epochs // 10, 1)
            self.eval_interval = 10_000     # evaluate once, at the end
            self.print_interval = 50
            self.data_num_workers = 0
            self.save_history_ckpt = False
            self.multiscale_range = 0
            self.test_conf = 0.05
            self.device_augment = device_aug
            self.data_dir = data_dir
            self.output_dir = out_dir

        def get_eval_dataset(self, **kwargs):
            from yolox_tpu.data import CocoDataset, ValTransform

            return CocoDataset(
                data_dir=self.data_dir, json_file=self.train_ann,
                name="train2017", img_size=self.test_size,
                preproc=ValTransform())

    return AbConfig()


def run_one(data_dir: str, out_dir: str, epochs: int, device_aug: bool):
    import numpy as np

    from yolox_tpu.models.yolox import YoloxModule
    from yolox_tpu.utils.checkpoint import load_checkpoint

    cfg = make_config(data_dir, out_dir, epochs, device_aug)
    args = SimpleNamespace(batch_size=4, fp16=False, cache=None,
                           logger="tensorboard", ckpt=None, resume=False,
                           start_epoch=None, name=cfg.name)
    trainer = cfg.get_trainer(args)
    trainer.train()
    final_loss = float(np.asarray(trainer.meter["total_loss"].latest))

    # evaluate the saved (EMA) checkpoint on the training images
    ckpt = load_checkpoint(os.path.join(out_dir, cfg.name,
                                        "latest_ckpt.pth"))
    module = YoloxModule.from_config(cfg)
    module.load_params(ckpt["model"])
    evaluator = cfg.get_evaluator(batch_size=4)
    ap50_95, ap50, _summary = evaluator.evaluate(module, distributed=False)
    return {
        "device_augment": device_aug,
        "final_loss": round(final_loss, 4),
        "ap50_95": round(float(ap50_95), 4),
        "ap50": round(float(ap50), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--out", default="/tmp/aug_ab")
    args = ap.parse_args()

    from _synthetic_coco import build_synthetic_coco

    root = pathlib.Path(args.out)
    root.mkdir(parents=True, exist_ok=True)
    data_dir = build_synthetic_coco(root / "data")

    host = run_one(data_dir, str(root), args.epochs, device_aug=False)
    dev = run_one(data_dir, str(root), args.epochs, device_aug=True)
    report = {
        "epochs": args.epochs,
        "host": host,
        "device": dev,
        "ap50_delta": round(dev["ap50"] - host["ap50"], 4),
        "ap50_95_delta": round(dev["ap50_95"] - host["ap50_95"], 4),
    }
    print("AUG_OUTCOME_AB " + json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
