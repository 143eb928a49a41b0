"""Smoke lane: a <60 s cross-section of the framework for CI / driver gates.

Run with ``pytest -m smoke``.  One test per major seam — model forward,
jitted train step, fixpoint NMS vs a numpy oracle, one COCOeval cell — all
self-contained (no torch reference, no native build, no chip required).

Reference analog: the upstream fast unit tests under
/root/reference/tests/unit (postprocess, utils) which run in seconds.
"""

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def smoke_module():
    from yolox_tpu import YoloxConfig, YoloxModule

    # thinnest legal model: keeps CPU compile time inside the smoke budget
    cfg = YoloxConfig.get_named_config("yolox_nano")
    cfg.depth, cfg.width = 0.33, 0.125
    return YoloxModule.from_config(cfg), cfg


def test_model_forward(smoke_module):
    module, cfg = smoke_module
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out = module(x)
    # decoded predictions: (batch, anchors, 5 + num_classes)
    assert out.shape == (1, (8**2 + 4**2 + 2**2), 5 + cfg.num_classes)
    assert bool(jnp.isfinite(out).all())


def test_train_step_runs(smoke_module):
    from yolox_tpu.core import init_train_state, make_train_step

    module, cfg = smoke_module
    state = init_train_state(module.params)
    # tiny SimOTA candidate cap: the 2048-slot compaction dominates CPU
    # compile time and is covered by the full lane, not the smoke lane
    step = make_train_step(module, cfg.num_classes, num_candidates=64)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    labels = np.zeros((1, 4, 5), np.float32)
    labels[:, 0] = [1, 32, 32, 20, 20]
    state, metrics = step(state, x, labels, jnp.float32(0.01))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state["step"]) == 1


def _greedy_nms_np(boxes, scores, thr):
    order = np.argsort(-scores, kind="stable")
    keep, suppressed = [], np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        iou = inter / np.maximum(a + ai - inter, 1e-9)
        suppressed |= (iou > thr) & (scores < scores[i])
    return sorted(keep)


def test_nms_matches_numpy_oracle():
    from yolox_tpu.ops.nms import nms_fixed

    rng = np.random.default_rng(3)
    xy = rng.uniform(0, 60, (48, 2)).astype(np.float32)
    wh = rng.uniform(4, 30, (48, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = rng.uniform(0.01, 1.0, 48).astype(np.float32)
    # nms_fixed expects score-sorted input
    order = np.argsort(-scores, kind="stable")
    boxes, scores = boxes[order], scores[order]
    keep_mask = np.asarray(nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    got = sorted(np.nonzero(keep_mask)[0].tolist())
    assert got == _greedy_nms_np(boxes, scores, 0.5)


def test_cocoeval_perfect_detections():
    from tests.test_cocoeval import test_perfect_detections

    test_perfect_detections()


def test_nonfinite_loss_watchdog():
    """Failure detection: a NaN/inf loss aborts training with a loud,
    actionable error instead of silently poisoning every later
    checkpoint (the reference trainer has no guard). Unit-level: the
    check reads host-side meter scalars only."""
    from yolox_tpu.core.trainer import Trainer
    from yolox_tpu.utils.metric import MeterBuffer

    t = Trainer.__new__(Trainer)   # no __init__: the check needs only these
    t.meter = MeterBuffer(window_size=20)
    t.epoch, t.iter = 0, 4
    t.meter.update(total_loss=3.2, iou_loss=1.0, lr=0.01)
    t._check_finite_loss()         # finite: no-op

    t.meter.update(total_loss=float("nan"), iou_loss=float("inf"), lr=0.01)
    with pytest.raises(FloatingPointError, match="non-finite training loss"):
        t._check_finite_loss()
