"""COCOeval correctness on hand-computable scenarios + evaluator E2E.

The reference relies on pycocotools (+ a C++ kernel); ours is
self-contained, so these tests pin the algorithm to known-answer cases:
perfect detections, partial recall, IoU-threshold sensitivity, crowd
handling, area ranges, and maxDets truncation.
"""

import numpy as np
import pytest

from yolox_tpu.data.coco_json import COCO
from yolox_tpu.evaluators.cocoeval import COCOeval


def _gt(images, anns, cats=(1,)):
    coco = COCO()
    coco.dataset = {
        "images": [{"id": i, "width": 640, "height": 640} for i in images],
        "annotations": [
            {
                "id": k + 1,
                "image_id": a["image_id"],
                "category_id": a.get("category_id", 1),
                "bbox": a["bbox"],
                "area": a["bbox"][2] * a["bbox"][3],
                "iscrowd": a.get("iscrowd", 0),
            }
            for k, a in enumerate(anns)
        ],
        "categories": [{"id": c, "name": f"c{c}"} for c in cats],
    }
    coco.create_index()
    return coco


def _run(gt, dets):
    dt = gt.loadRes(dets)
    ev = COCOeval(gt, dt, "bbox")
    ev.evaluate()
    ev.accumulate()
    import contextlib
    import io

    with contextlib.redirect_stdout(io.StringIO()):
        ev.summarize()
    return ev


def test_perfect_detections():
    gt = _gt([0, 1], [
        {"image_id": 0, "bbox": [10, 10, 100, 100]},
        {"image_id": 1, "bbox": [50, 50, 80, 40]},
    ])
    dets = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 100, 100],
         "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [50, 50, 80, 40],
         "score": 0.8},
    ]
    ev = _run(gt, dets)
    assert ev.stats[0] == pytest.approx(1.0)
    assert ev.stats[1] == pytest.approx(1.0)
    assert ev.stats[8] == pytest.approx(1.0)  # AR@100


def test_half_recall():
    gt = _gt([0], [
        {"image_id": 0, "bbox": [10, 10, 100, 100]},
        {"image_id": 0, "bbox": [300, 300, 100, 100]},
    ])
    dets = [{"image_id": 0, "category_id": 1, "bbox": [10, 10, 100, 100],
             "score": 0.9}]
    ev = _run(gt, dets)
    # precision 1.0 up to recall 0.5: 51 of 101 recall points
    assert ev.stats[0] == pytest.approx(51 / 101)
    assert ev.stats[8] == pytest.approx(0.5)


def test_iou_threshold_sensitivity():
    # det has IoU ~0.6172 with gt: TP at thresholds .5/.55/.6, FP above
    gt = _gt([0], [{"image_id": 0, "bbox": [0, 0, 100, 100]}])
    dets = [{"image_id": 0, "category_id": 1, "bbox": [0, 0, 100, 62],
             "score": 0.9}]
    iou = (100 * 62) / (100 * 100)  # det contained in gt: iou = 0.62
    assert 0.6 < iou < 0.65
    ev = _run(gt, dets)
    assert ev.stats[1] == pytest.approx(1.0)          # AP50
    assert ev.stats[0] == pytest.approx(3 / 10)       # 3 of 10 thresholds
    assert ev.stats[2] == pytest.approx(0.0)          # AP75


def test_crowd_not_counted_as_fp():
    gt = _gt([0], [
        {"image_id": 0, "bbox": [10, 10, 100, 100]},
        {"image_id": 0, "bbox": [300, 300, 200, 200], "iscrowd": 1},
    ])
    dets = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 100, 100],
         "score": 0.9},
        # fully inside the crowd region -> matched to crowd -> ignored
        {"image_id": 0, "category_id": 1, "bbox": [320, 320, 100, 100],
         "score": 0.8},
    ]
    ev = _run(gt, dets)
    assert ev.stats[0] == pytest.approx(1.0)

    # same second det against a NON-crowd scene is a plain FP at recall 1.0
    gt2 = _gt([0], [{"image_id": 0, "bbox": [10, 10, 100, 100]}])
    ev2 = _run(gt2, dets)
    assert ev2.stats[0] == pytest.approx(1.0)  # envelope keeps AP at 1


def test_area_ranges():
    # one small (16x16=256 < 32^2) + one large (200x200 > 96^2) gt
    gt = _gt([0], [
        {"image_id": 0, "bbox": [10, 10, 16, 16]},
        {"image_id": 0, "bbox": [300, 300, 200, 200]},
    ])
    dets = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 16, 16],
         "score": 0.9},
    ]
    ev = _run(gt, dets)
    assert ev.stats[3] == pytest.approx(1.0)   # AP small
    assert ev.stats[5] == pytest.approx(0.0)   # AP large (missed)
    assert ev.stats[4] == pytest.approx(-1.0)  # AP medium: no gts -> -1


def test_maxdets_truncation():
    gt = _gt([0], [{"image_id": 0, "bbox": [10, 10, 100, 100]}])
    # 1 real det buried under 2 higher-scored FPs: AR@1 = 0, AR@100 = 1
    dets = [
        {"image_id": 0, "category_id": 1, "bbox": [400, 400, 50, 50],
         "score": 0.95},
        {"image_id": 0, "category_id": 1, "bbox": [500, 500, 50, 50],
         "score": 0.93},
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 100, 100],
         "score": 0.9},
    ]
    ev = _run(gt, dets)
    assert ev.stats[6] == pytest.approx(0.0)  # AR@1
    assert ev.stats[8] == pytest.approx(1.0)  # AR@100


def test_evaluator_end_to_end(coco_dir):
    """CocoEvaluator wiring: a fake model emitting the ground truth as
    decoded predictions must score mAP ~= 1.0."""
    from yolox_tpu.data import (
        CocoDataset, DataLoader, SequentialBatchSampler, ValTransform)
    from yolox_tpu.evaluators import CocoEvaluator

    img_size = (64, 64)
    dataset = CocoDataset(
        data_dir=coco_dir, json_file="instances_train2017.json",
        name="train2017", img_size=img_size, preproc=ValTransform())
    loader = DataLoader(
        dataset,
        batch_sampler=SequentialBatchSampler(len(dataset), batch_size=4))

    num_classes = 3  # categories 1, 3, 7 -> class idx 0, 1, 2

    class FakeModel:
        """Emits each gt as one high-confidence anchor (decoded format)."""

        def __call__(self, imgs):
            b = imgs.shape[0]
            a = 64
            out = np.zeros((b, a, 5 + num_classes), np.float32)
            out[..., 2:4] = 1.0   # degenerate boxes for unused anchors
            for i in range(b):
                idx = self._ids[i]
                # annotations already scaled to img_size by the dataset
                labels = dataset.load_anno(idx)
                for k, lab in enumerate(labels):
                    x1, y1, x2, y2, cls = lab
                    out[i, k, 0] = (x1 + x2) / 2
                    out[i, k, 1] = (y1 + y2) / 2
                    out[i, k, 2] = max(x2 - x1, 1e-3)
                    out[i, k, 3] = max(y2 - y1, 1e-3)
                    out[i, k, 4] = 0.99
                    out[i, k, 5 + int(cls)] = 0.99
            return out

    fake = FakeModel()

    # thread ids through: wrap the loader to capture batch ids
    class LoaderWrapper:
        def __init__(self, loader):
            self.loader = loader
            self.dataset = loader.dataset
            self.batch_sampler = loader.batch_sampler

        def __len__(self):
            return len(self.loader)

        def __iter__(self):
            for imgs, targets, infos, ids in self.loader:
                fake._ids = [int(np.asarray(i).reshape(-1)[0])
                             for i in ids]
                yield imgs, targets, infos, ids

    evaluator = CocoEvaluator(
        dataloader=LoaderWrapper(loader), img_size=img_size,
        confthre=0.5, nmsthre=0.65, num_classes=num_classes, max_det=64)
    ap50_95, ap50, summary = evaluator.evaluate(fake)
    assert ap50 > 0.99, summary
    assert ap50_95 > 0.9, summary


def test_native_matches_python():
    """C++ matching kernel vs the pure-python evaluateImg on randomized
    scenarios (crowds, ignores, area spread, score ties)."""
    from yolox_tpu.native import load_cocoeval_lib

    if load_cocoeval_lib() is None:
        pytest.skip("no C++ toolchain available")

    rng = np.random.default_rng(0)
    images = list(range(6))
    anns, dets = [], []
    for img in images:
        for _ in range(int(rng.integers(0, 8))):
            w, h = rng.uniform(5, 300, 2)
            x, y = rng.uniform(0, 600 - w), rng.uniform(0, 600 - h)
            anns.append({"image_id": img,
                         "category_id": int(rng.choice([1, 2])),
                         "bbox": [x, y, w, h],
                         "iscrowd": int(rng.random() < 0.2)})
        for _ in range(int(rng.integers(0, 15))):
            w, h = rng.uniform(5, 300, 2)
            x, y = rng.uniform(0, 600 - w), rng.uniform(0, 600 - h)
            dets.append({"image_id": img,
                         "category_id": int(rng.choice([1, 2])),
                         "bbox": [float(x), float(y), float(w), float(h)],
                         "score": float(rng.choice(
                             [0.9, 0.9, rng.uniform(0.05, 1.0)]))})

    gt = _gt(images, anns, cats=(1, 2))

    def run(use_native):
        dt = gt.loadRes([dict(d) for d in dets])
        ev = COCOeval(gt, dt, "bbox")
        ev.evaluate(use_native=use_native)
        ev.accumulate()
        import contextlib
        import io

        with contextlib.redirect_stdout(io.StringIO()):
            ev.summarize()
        return ev

    ev_py = run(False)
    ev_cc = run(True)
    np.testing.assert_allclose(ev_cc.stats, ev_py.stats, atol=1e-12)
    np.testing.assert_allclose(
        ev_cc.eval["precision"], ev_py.eval["precision"], atol=1e-12)
    np.testing.assert_allclose(
        ev_cc.eval["recall"], ev_py.eval["recall"], atol=1e-12)


def test_columnar_matches_dict_path():
    """loadRes of a columnar dict (round-5 at-scale memory path) produces
    bitwise-identical PR tensors to the classic per-ann dict list,
    including score ties (submission-order tie-break) and maxDets
    truncation."""
    rng = np.random.default_rng(7)
    images = list(range(5))
    anns, dets = [], []
    for img in images:
        for _ in range(int(rng.integers(1, 6))):
            w, h = rng.uniform(5, 300, 2)
            x, y = rng.uniform(0, 600 - w), rng.uniform(0, 600 - h)
            anns.append({"image_id": img,
                         "category_id": int(rng.choice([1, 2])),
                         "bbox": [x, y, w, h],
                         "iscrowd": int(rng.random() < 0.15)})
        for _ in range(int(rng.integers(0, 140))):  # exercise maxDets=100
            w, h = rng.uniform(5, 300, 2)
            x, y = rng.uniform(0, 600 - w), rng.uniform(0, 600 - h)
            dets.append({"image_id": img,
                         "category_id": int(rng.choice([1, 2])),
                         "bbox": [float(x), float(y), float(w), float(h)],
                         "score": float(rng.choice(
                             [0.7, 0.7, rng.uniform(0.05, 1.0)]))})

    gt = _gt(images, anns, cats=(1, 2))

    def run(res):
        dt = gt.loadRes(res)
        ev = COCOeval(gt, dt, "bbox")
        ev.evaluate(use_native=False)
        ev.accumulate()
        import contextlib
        import io

        with contextlib.redirect_stdout(io.StringIO()):
            ev.summarize()
        return ev

    ev_dict = run([dict(d) for d in dets])
    columnar = {
        "image_id": np.array([d["image_id"] for d in dets], np.int64),
        "category_id": np.array([d["category_id"] for d in dets],
                                np.int64),
        "bbox": np.array([d["bbox"] for d in dets], np.float64),
        "score": np.array([d["score"] for d in dets], np.float64),
    }
    ev_col = run(columnar)
    np.testing.assert_array_equal(ev_col.stats, ev_dict.stats)
    np.testing.assert_array_equal(
        ev_col.eval["precision"], ev_dict.eval["precision"])
    np.testing.assert_array_equal(
        ev_col.eval["recall"], ev_dict.eval["recall"])
    np.testing.assert_array_equal(
        ev_col.eval["scores"], ev_dict.eval["scores"])
