"""Device-augment training-outcome A/B (SURVEY §5 / round-4 item).

Trains the SAME tiny detection task twice through the full Trainer — once
with the host augmentation pipeline (cv2 mosaic/affine/HSV/flip,
reference semantics owner
`/root/reference/yolox/data/datasets/mosaicdetection.py:76-158`) and once
with `device_augment=True` (the on-device engine,
`yolox_tpu/data/device_augment.py`) — and compares training OUTCOMES:
final loss and whether the trained model emits confident, correctly
classified, correctly centered detections on the clean images. This is
the outcome-level complement to the distribution-level equivalence test
(`tests/test_augment_equivalence.py`).

The dataset has real signal (colored rectangles, `build_learnable_coco`),
so convergence is learnable, not memorization.

Usage:
    python scripts/augment_ab.py [--epochs 50] [--which both|host|dev]

Prints one `RESULT {json}` line per arm. ~20 min/arm on a 1-core CPU
host; minutes on a TPU chip.
"""

import argparse
import json
import pathlib
import sys
import tempfile
import time
from argparse import Namespace

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

from yolox_tpu import YoloxConfig


class ABConfig(YoloxConfig):
    """Tiny 3-class config over the learnable synthetic set; geometry
    kept mild (no rotation/shear/mixup) so 50 epochs x 4 iters converge
    on CPU-testable budgets."""

    def __init__(self, data_dir, out_dir, dev, max_epoch):
        super().__init__("aug_ab_dev" if dev else "aug_ab_host")
        self.num_classes = 3
        self.depth, self.width = 0.33, 0.125
        self.input_size = self.test_size = (96, 96)
        self.max_epoch = max_epoch
        self.warmup_epochs = 2
        self.no_aug_epochs = max(2, max_epoch // 5)
        self.eval_interval = 10**6
        self.print_interval = 20
        self.data_num_workers = 0
        self.save_history_ckpt = False
        self.multiscale_range = 0
        self.enable_mixup = False
        self.mixup_prob = 0.0
        self.degrees = 0.0
        self.shear = 0.0
        self.mosaic_scale = (0.5, 1.5)
        self.basic_lr_per_img = 0.02 / 4
        self.device_augment = dev
        self.seed = 3
        self.data_dir = data_dir
        self.output_dir = out_dir

    def get_eval_dataset(self, **kw):
        from yolox_tpu.data import CocoDataset, ValTransform

        return CocoDataset(
            data_dir=self.data_dir, json_file=self.train_ann,
            name="train2017", img_size=self.test_size,
            preproc=ValTransform())


def detect(cfg, params, data_dir, n=6, conf=0.1):
    """Clean-image detections: per image, top box's class / confidence /
    whether its center falls inside the gt box."""
    import cv2
    import jax.numpy as jnp

    from yolox_tpu.data.data_augment import ValTransform
    from yolox_tpu.models.yolox import YoloxModule
    from yolox_tpu.ops.nms import postprocess_device

    module = YoloxModule.from_config(cfg)
    module.params = params
    vt = ValTransform()
    ann = json.load(open(pathlib.Path(data_dir)
                         / "annotations/instances_train2017.json"))
    cat_to_idx = {c["id"]: i for i, c in enumerate(
        sorted(ann["categories"], key=lambda c: c["id"]))}
    gt = {a["image_id"]: a for a in ann["annotations"]}
    out = []
    for im in ann["images"][:n]:
        img = cv2.imread(str(pathlib.Path(data_dir) / "train2017"
                             / im["file_name"]))
        x, _ = vt(img, None, cfg.test_size)
        dets, valid = postprocess_device(
            module(jnp.asarray(x)[None]), cfg.num_classes,
            conf_thre=conf, nms_thre=0.65)
        d, v = np.asarray(dets[0]), int(np.asarray(valid[0]).sum())
        a = gt[im["id"]]
        gx, gy, gw, gh = a["bbox"]
        rec = {"img": im["id"], "n": v,
               "gt_cls": cat_to_idx[a["category_id"]]}
        if v:
            top = d[0]
            cx, cy = (top[0] + top[2]) / 2, (top[1] + top[3]) / 2
            rec.update(cls=int(top[6]), conf=float(top[4] * top[5]),
                       center_in_gt=bool(gx <= cx <= gx + gw
                                         and gy <= cy <= gy + gh))
        out.append(rec)
    return out


def run_arm(dev: bool, data_dir: str, max_epoch: int) -> dict:
    out_dir = tempfile.mkdtemp(prefix=f"aug_ab_{dev}_")
    cfg = ABConfig(data_dir, out_dir, dev, max_epoch)
    args = Namespace(batch_size=4, fp16=False, cache=None,
                     logger="tensorboard", ckpt=None, resume=False,
                     start_epoch=None, name=None, devices=1)
    t0 = time.time()
    trainer = cfg.get_trainer(args)
    trainer.train()
    wall = time.time() - t0
    dets = detect(cfg, trainer._eval_params(), data_dir)
    good = [d for d in dets
            if d["n"] and d.get("cls") == d["gt_cls"]
            and d.get("conf", 0) > 0.3 and d.get("center_in_gt")]
    return {"dev": dev, "wall_s": round(wall, 1),
            "run_avg_loss": float(trainer.meter["total_loss"].global_avg),
            "final_loss": float(trainer.meter["total_loss"].avg),
            "confident_correct": len(good), "dets": dets}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--which", choices=["both", "host", "dev"],
                    default="both")
    args = ap.parse_args(argv)

    from tests._synthetic_coco import build_learnable_coco

    data_dir = build_learnable_coco(tempfile.mkdtemp(prefix="lcoco_"))
    arms = {"both": [False, True], "host": [False], "dev": [True]}
    results = []
    for dev in arms[args.which]:
        r = run_arm(dev, data_dir, args.epochs)
        print("RESULT", json.dumps(r), flush=True)
        results.append(r)
    return results


if __name__ == "__main__":
    main()
