"""VOC dataset + evaluation path on a synthetic VOCdevkit tree
(reference `yolox/data/datasets/voc.py`, `yolox/evaluators/voc_eval.py`)."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest


def _obj_xml(name, box, difficult=0):
    o = ET.Element("object")
    ET.SubElement(o, "name").text = name
    ET.SubElement(o, "difficult").text = str(difficult)
    b = ET.SubElement(o, "bndbox")
    for tag, v in zip(("xmin", "ymin", "xmax", "ymax"), box):
        ET.SubElement(b, tag).text = str(int(v))
    return o


@pytest.fixture(scope="module")
def voc_dir(tmp_path_factory):
    import cv2

    from yolox_tpu.data.datasets.voc_classes import VOC_CLASSES

    root = tmp_path_factory.mktemp("VOCdevkit")
    year = "2007"
    base = root / f"VOC{year}"
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        (base / sub).mkdir(parents=True)

    rng = np.random.default_rng(0)
    names = []
    boxes = {}
    for i in range(4):
        img_id = f"{i:06d}"
        names.append(img_id)
        h, w = 120, 160
        cv2.imwrite(str(base / "JPEGImages" / f"{img_id}.jpg"),
                    rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        ann = ET.Element("annotation")
        size = ET.SubElement(ann, "size")
        ET.SubElement(size, "width").text = str(w)
        ET.SubElement(size, "height").text = str(h)
        ET.SubElement(size, "depth").text = "3"
        cls = VOC_CLASSES[int(rng.integers(0, 3))]
        box = sorted(rng.integers(5, w // 2, 2)) + sorted(
            rng.integers(60, h - 5, 2))
        box = [box[0], box[2], box[1], box[3]]  # xmin ymin xmax ymax
        if box[2] <= box[0]:
            box[2] = box[0] + 20
        if box[3] <= box[1]:
            box[3] = box[1] + 20
        ann.append(_obj_xml(cls, box))
        ET.ElementTree(ann).write(base / "Annotations" / f"{img_id}.xml")
        boxes[img_id] = (cls, box)
    with open(base / "ImageSets" / "Main" / "trainval.txt", "w") as f:
        f.write("\n".join(names) + "\n")
    return str(root), boxes


def test_voc_dataset_items(voc_dir):
    from yolox_tpu.data import ValTransform
    from yolox_tpu.data.datasets import VocDetection

    root, boxes = voc_dir
    ds = VocDetection(root, image_sets=[("2007", "trainval")],
                      img_size=(64, 64), preproc=ValTransform())
    assert len(ds) == 4
    img, target, info, idx = ds.pull_item(0)
    assert img.shape[2] == 3 and target.shape[1] == 5
    # label row: (x1, y1, x2, y2, cls) scaled by the pre-resize ratio
    r = min(64 / info[0], 64 / info[1])
    cls, box = boxes["000000"]
    np.testing.assert_allclose(
        target[0, :4], (np.array(box) - [1, 1, 1, 1]) * r, atol=1.0)


def test_voc_eval_perfect_predictions(voc_dir):
    """Ground truth fed as predictions: AP == 1 for every class that has
    ground truth. Classes without gt contribute AP=0 to the mean — the
    reference's exact semantics (`voc.py:307`, all 20 classes averaged)."""
    from yolox_tpu.data.datasets import VocDetection
    from yolox_tpu.data.datasets.voc_classes import VOC_CLASSES

    root, boxes = voc_dir
    ds = VocDetection(root, image_sets=[("2007", "trainval")],
                      img_size=(64, 64))
    all_boxes = [[np.empty((0, 5)) for _ in range(len(ds))]
                 for _ in VOC_CLASSES]
    gt_classes = set()
    for i in range(len(ds)):
        img_id = f"{i:06d}"
        cls, box = boxes[img_id]
        c = VOC_CLASSES.index(cls)
        gt_classes.add(c)
        all_boxes[c][i] = np.array(
            [[box[0] - 1, box[1] - 1, box[2] - 1, box[3] - 1, 0.99]])
    map5095, map50 = ds.evaluate_detections(all_boxes)
    expected = len(gt_classes) / len(VOC_CLASSES)
    assert map50 == pytest.approx(expected)
    assert map5095 == pytest.approx(expected)


def test_voc_eval_wrong_class_scores_zero(voc_dir):
    from yolox_tpu.data.datasets import VocDetection
    from yolox_tpu.data.datasets.voc_classes import VOC_CLASSES

    root, boxes = voc_dir
    ds = VocDetection(root, image_sets=[("2007", "trainval")],
                      img_size=(64, 64))
    all_boxes = [[np.empty((0, 5)) for _ in range(len(ds))]
                 for _ in VOC_CLASSES]
    for i in range(len(ds)):
        img_id = f"{i:06d}"
        cls, box = boxes[img_id]
        wrong = (VOC_CLASSES.index(cls) + 7) % len(VOC_CLASSES)
        all_boxes[wrong][i] = np.array(
            [[box[0] - 1, box[1] - 1, box[2] - 1, box[3] - 1, 0.99]])
    map5095, map50 = ds.evaluate_detections(all_boxes)
    assert map50 == pytest.approx(0.0)


def test_voc_evaluator_end_to_end(voc_dir):
    """VocEvaluator.evaluate over the pipelined inference loop."""
    import jax.numpy as jnp

    from yolox_tpu import YoloxConfig, YoloxModule
    from yolox_tpu.data import DataLoader, SequentialBatchSampler, ValTransform
    from yolox_tpu.data.datasets import VocDetection
    from yolox_tpu.evaluators import VocEvaluator

    root, _ = voc_dir
    ds = VocDetection(root, image_sets=[("2007", "trainval")],
                      img_size=(64, 64), preproc=ValTransform())
    loader = DataLoader(ds, SequentialBatchSampler(len(ds), batch_size=2),
                        num_workers=0)
    cfg = YoloxConfig.get_named_config("yolox_nano")
    cfg.num_classes = 20
    module = YoloxModule.from_config(cfg)
    evaluator = VocEvaluator(dataloader=loader, img_size=(64, 64),
                             confthre=1e-6, nmsthre=0.65, num_classes=20)
    map5095, map50, summary = evaluator.evaluate(
        lambda x: module(jnp.asarray(np.asarray(x), jnp.float32)))
    assert 0.0 <= map50 <= 1.0 and 0.0 <= map5095 <= 1.0
    assert summary


@pytest.mark.slow
def test_voc_training_e2e(voc_dir, tmp_path):
    """Full VOC TRAINING path through the Trainer: VocDetection wrapped
    in MosaicDetection by the generic loader, in-train VOC mAP eval,
    checkpoints. Upstream YOLOX ships this as exps/example/yolox_voc
    (dropped by the pixeltable fork); here it is a 3-method config
    override, exercised end to end."""
    from argparse import Namespace

    from yolox_tpu import YoloxConfig

    root, _ = voc_dir

    class VocTinyConfig(YoloxConfig):
        def __init__(self):
            super().__init__("voc_tiny_e2e")
            self.num_classes = 20
            self.depth, self.width = 0.33, 0.125
            self.input_size = self.test_size = (64, 64)
            self.max_epoch = 1
            self.warmup_epochs = 1
            self.no_aug_epochs = 1     # one train program; eval-in-train
            self.print_interval = 1
            self.data_num_workers = 0
            self.save_history_ckpt = False
            self.multiscale_range = 0
            self.test_conf = 1e-4      # random weights must emit dets
            self.data_dir = root
            self.output_dir = str(tmp_path / "out")

        def get_dataset(self, cache=False, cache_type="ram"):
            from yolox_tpu.data import TrainTransform
            from yolox_tpu.data.datasets import VocDetection

            return VocDetection(
                self.data_dir, image_sets=[("2007", "trainval")],
                img_size=self.input_size,
                preproc=TrainTransform(max_labels=self.max_labels,
                                       flip_prob=self.flip_prob,
                                       hsv_prob=self.hsv_prob))

        def get_eval_dataset(self, **kw):
            from yolox_tpu.data import ValTransform
            from yolox_tpu.data.datasets import VocDetection

            return VocDetection(
                self.data_dir, image_sets=[("2007", "trainval")],
                img_size=self.test_size, preproc=ValTransform())

        def get_evaluator(self, batch_size, is_distributed=False,
                          testdev=False, legacy=False):
            from yolox_tpu.evaluators import VocEvaluator

            return VocEvaluator(
                dataloader=self.get_eval_loader(batch_size,
                                                is_distributed),
                img_size=self.test_size, confthre=self.test_conf,
                nmsthre=self.nmsthre, num_classes=self.num_classes)

    cfg = VocTinyConfig()
    args = Namespace(batch_size=2, fp16=False, cache=None,
                     logger="tensorboard", ckpt=None, resume=False,
                     start_epoch=None, name=None, devices=1)
    trainer = cfg.get_trainer(args)
    trainer.train()

    run_dir = os.path.join(cfg.output_dir, "voc_tiny_e2e")
    # last_epoch is written only by evaluate_and_save_model -> the VOC
    # evaluator ran inside the training loop
    assert os.path.exists(os.path.join(run_dir, "last_epoch_ckpt.pth"))
    log = open(os.path.join(run_dir, "train_log.txt")).read()
    # training iterations logged finite losses (print_interval=1 clears
    # the meter window after each print, so assert on the log) and the
    # VOC evaluator's summary line appeared
    assert "total_loss" in log and "total_loss: nan" not in log
    assert "mAP50" in log          # VocEvaluator's summary line
