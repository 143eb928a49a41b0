"""On-device fixed-shape NMS and detection postprocessing.

TPU-native replacement for the reference postprocess
(`/root/reference/yolox/utils/boxes.py:31-75`), which filters by confidence
then calls torchvision.ops.nms / batched_nms on host. Here everything is a
single jitted XLA graph with static shapes:

  score-threshold mask -> top-K candidate selection (lax.top_k)
  -> O(K^2) IoU matrix -> sequential greedy suppression (lax.fori_loop)

Semantics match torchvision exactly: candidates sorted by score descending
(ties -> lower original index first, both sorts are stable), suppression is
strict `iou > threshold`, class-aware NMS uses the coordinate-offset trick
with offset = max_coordinate + 1 (torchvision batched_nms).

Output is fixed-shape (max_det, 7) rows (x1, y1, x2, y2, obj, cls_conf,
cls_idx) + a validity mask, in score order — identical rows to the
reference's variable-length output where valid.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from yolox_tpu.ops.boxes import pairwise_iou_xyxy

NEG_INF_SCORE = -1e10


def _greedy_suppress(iou, valid, thr):
    """Greedy NMS over score-sorted candidates given their IoU matrix."""
    k = iou.shape[0]
    idx = jnp.arange(k)

    def body(i, keep):
        keep_i = keep[i]
        suppress = (iou[i] > thr) & (idx > i) & keep_i
        return keep & ~suppress

    return jax.lax.fori_loop(0, k, body, valid)


def nms_fixed(boxes, scores, iou_threshold: float, valid=None):
    """Class-agnostic NMS on score-sorted boxes (K, 4)/(K,). Returns keep mask."""
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    iou = pairwise_iou_xyxy(boxes, boxes)
    return _greedy_suppress(iou, valid, iou_threshold)


def batched_nms_fixed(boxes, scores, classes, iou_threshold: float, valid=None):
    """Class-aware NMS via the torchvision coordinate-offset trick."""
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0))
    offsets = classes.astype(boxes.dtype) * (max_coord + 1)
    return nms_fixed(boxes + offsets[:, None], scores, iou_threshold, valid)


@partial(jax.jit, static_argnames=(
    "num_classes", "class_agnostic", "max_det", "use_pallas"))
def postprocess_device(
    prediction,
    num_classes: int,
    conf_thre: float = 0.7,
    nms_thre: float = 0.45,
    class_agnostic: bool = False,
    max_det: int = 1024,
    use_pallas: bool = False,
):
    """Batched detection postprocess on device.

    Args:
      prediction: (B, A, 5 + num_classes) decoded model output
        (cx, cy, w, h, obj, cls...).
    Returns:
      detections: (B, max_det, 7) rows (x1, y1, x2, y2, obj, cls_conf, cls),
        score-descending.
      valid: (B, max_det) bool mask of surviving rows.
    """

    def per_image(pred):
        box_xyxy = jnp.stack(
            [
                pred[:, 0] - pred[:, 2] / 2,
                pred[:, 1] - pred[:, 3] / 2,
                pred[:, 0] + pred[:, 2] / 2,
                pred[:, 1] + pred[:, 3] / 2,
            ],
            axis=1,
        )
        cls_scores = pred[:, 5:5 + num_classes]
        class_conf = jnp.max(cls_scores, axis=1)
        class_pred = jnp.argmax(cls_scores, axis=1)
        obj = pred[:, 4]
        score = obj * class_conf
        conf_mask = score >= conf_thre

        k = min(max_det, pred.shape[0])
        masked = jnp.where(conf_mask, score, NEG_INF_SCORE)
        top_scores, top_idx = jax.lax.top_k(masked, k)
        valid = top_scores > NEG_INF_SCORE / 2

        boxes_k = box_xyxy[top_idx]
        cls_k = class_pred[top_idx]
        if use_pallas:
            # VMEM-resident Pallas suppression kernel (yolox_tpu/ops/
            # pallas_nms.py); identical results, K must be 128-aligned
            from yolox_tpu.ops.pallas_nms import nms_pallas

            nms_boxes = boxes_k
            if not class_agnostic:
                max_coord = jnp.max(jnp.where(valid[:, None], boxes_k, 0.0))
                nms_boxes = boxes_k + (
                    cls_k.astype(boxes_k.dtype) * (max_coord + 1))[:, None]
            keep = nms_pallas(nms_boxes, top_scores, nms_thre, valid)
        elif class_agnostic:
            keep = nms_fixed(boxes_k, top_scores, nms_thre, valid)
        else:
            keep = batched_nms_fixed(boxes_k, top_scores, cls_k, nms_thre,
                                     valid)

        det = jnp.concatenate(
            [
                boxes_k,
                obj[top_idx, None],
                class_conf[top_idx, None],
                cls_k[:, None].astype(pred.dtype),
            ],
            axis=1,
        )
        # Compact kept rows to the front, preserving score order.
        order = jnp.argsort(~keep, stable=True)
        det = det[order]
        keep = keep[order]
        if k < max_det:
            det = jnp.pad(det, ((0, max_det - k), (0, 0)))
            keep = jnp.pad(keep, (0, max_det - k))
        return det, keep

    return jax.vmap(per_image)(prediction)
