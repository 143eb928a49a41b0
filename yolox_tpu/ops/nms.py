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
    """Greedy NMS over score-sorted candidates given their IoU matrix.

    Computed as a fixpoint instead of K sequential steps: greedy keep is
    the unique solution of  keep[j] = valid[j] & !any(i<j: keep[i] &
    iou[i,j] > thr)  (position j depends only on positions before it, so
    the fixpoint is unique by induction over score order). Each round is
    one (K,K)x(K,) matvec on the MXU and the loop exits at convergence —
    ~suppression-chain-depth rounds (typically <10) instead of K.
    """
    k = iou.shape[0]
    idx = jnp.arange(k)
    # sup[j, i] = candidate i is higher-scored than j and overlaps it
    sup = ((iou > thr) & (idx[None, :] < idx[:, None])).astype(jnp.float32)

    def cond(state):
        keep, converged = state
        return ~converged

    def body(state):
        keep, _ = state
        suppressed = (sup @ keep.astype(jnp.float32)) > 0.5
        new_keep = valid & ~suppressed
        return new_keep, jnp.all(new_keep == keep)

    keep, _ = jax.lax.while_loop(cond, body, (valid, jnp.bool_(False)))
    return keep


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


@partial(jax.jit, static_argnames=(
    "num_classes", "class_agnostic", "max_det"))
def postprocess_fused(
    outputs,
    grid,
    stride,
    num_classes: int,
    conf_thre: float = 0.7,
    nms_thre: float = 0.45,
    class_agnostic: bool = False,
    max_det: int = 256,
):
    """Bandwidth-optimal serving postprocess on raw head outputs.

    Takes the head's *pre-decode* outputs (`YoloxHead.forward_raw`), scores
    all anchors in the model compute dtype (bf16 in serving), selects the
    top-`max_det` candidates, and decodes/scores ONLY those in f32. Avoids
    materializing the decoded (B, A, 5+C) f32 tensor entirely — at B=256,
    A=8400 that is ~730 MB of HBM traffic per batch the non-fused path
    pays. Same output contract as `postprocess_device`; bitwise-identical
    to it when `outputs` is f32.

    Everything a selected candidate needs — box regressors, objectness,
    class score/index, its anchor's grid cell and stride — is packed into
    ONE (B, A, 10) payload table so selection is a single row gather.
    Five separate vmapped gathers from (A, ·) tables were the serving
    postprocess hotspot (~2.8 ms/batch of the nano b256 pipeline's 14.5 ms
    device time — each gather is row-fetch-bound, so width is nearly free
    and count is everything). The class index, grid coordinates and strides
    are small integers, exact in bf16 (|v| <= 256) for default-size
    configs; `_score_and_payload` promotes the table to f32 when a config
    exceeds that bound (num_classes > 257 or inputs > 2048 px).
    """
    masked, tbl = _score_and_payload(
        outputs, grid, stride, num_classes, conf_thre)
    return _select_decode_nms(
        masked, tbl, conf_thre, nms_thre, class_agnostic, max_det)


def postprocess_fused_levels(
    outs,
    grids,
    strides,
    num_classes: int,
    conf_thre: float = 0.7,
    nms_thre: float = 0.45,
    class_agnostic: bool = False,
    max_det: int = 256,
):
    """`postprocess_fused` on per-level raw outputs (identical results).

    Takes `YoloxHead.forward_raw_levels` lists and reduces each level to
    its (B, A_l) masked score + (B, A_l, 10) payload before concatenating,
    so the full (B, A, 5+C) tensor is never materialized (per-class max /
    argmax commute with row concatenation). Saves a write+read of ~154 MB
    (nano b256) to ~365 MB (s) per batch over the concatenated path.
    """
    pieces = [
        _score_and_payload(o, g, s, num_classes, conf_thre)
        for o, g, s in zip(outs, grids, strides)
    ]
    masked = jnp.concatenate([m for m, _ in pieces], axis=1)
    tbl = jnp.concatenate([t for _, t in pieces], axis=1)
    return _select_decode_nms(
        masked, tbl, conf_thre, nms_thre, class_agnostic, max_det)


def _score_and_payload(outputs, grid, stride, num_classes, conf_thre):
    """(B, A) masked scores + (B, A, 10) candidate payload table
    (x, y, w, h, obj, cls_conf, cls_idx, gx, gy, stride)."""
    b, a = outputs.shape[0], outputs.shape[1]
    dt = outputs.dtype
    cls_scores = outputs[..., 5:5 + num_classes]
    class_conf = jnp.max(cls_scores, axis=-1)
    class_pred = jnp.argmax(cls_scores, axis=-1)
    score = outputs[..., 4] * class_conf
    masked = jnp.where(score >= conf_thre, score, NEG_INF_SCORE)

    # The payload's integer-valued columns (class index, grid coords,
    # stride) must round-trip exactly through the table dtype. bf16 only
    # represents integers up to 256: promote the table to f32 when the
    # class count exceeds that, or when the grid was already promoted for
    # the same reason (`head.level_grid` on > 2048 px inputs). Keeps the
    # documented |v| <= 256 contract instead of silently corrupting class
    # ids / box positions on exotic configs.
    from yolox_tpu.models.head import exact_int_bound

    pdt = jnp.promote_types(dt, grid.dtype)
    if num_classes - 1 > exact_int_bound(pdt):
        pdt = jnp.promote_types(pdt, jnp.float32)

    tbl = jnp.concatenate(
        [
            outputs[..., :5].astype(pdt),
            class_conf[..., None].astype(pdt),
            class_pred.astype(pdt)[..., None],
            jnp.broadcast_to(grid.astype(pdt)[None], (b, a, 2)),
            jnp.broadcast_to(stride.astype(pdt)[None], (b, a, 1)),
        ],
        axis=-1,
    )
    return masked, tbl


def _select_decode_nms(masked, tbl, conf_thre, nms_thre, class_agnostic,
                       max_det):
    a = masked.shape[1]
    k = min(max_det, a)
    _, top_idx = jax.lax.top_k(masked, k)
    cand = jnp.take_along_axis(
        tbl, top_idx[..., None], axis=1).astype(jnp.float32)   # (B, k, 10)

    s = cand[..., 9:10]
    cxy = (cand[..., 0:2] + cand[..., 7:9]) * s
    wh = jnp.exp(cand[..., 2:4]) * s
    box_xyxy = jnp.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)
    obj = cand[..., 4]
    class_conf_k = cand[..., 5]
    cls_k = cand[..., 6]
    top_scores = obj * class_conf_k
    valid = top_scores >= conf_thre

    def per_image_nms(boxes, scores, classes, vmask):
        if class_agnostic:
            return nms_fixed(boxes, scores, nms_thre, vmask)
        return batched_nms_fixed(boxes, scores, classes, nms_thre, vmask)

    keep = jax.vmap(per_image_nms)(box_xyxy, top_scores, cls_k, valid)

    det = jnp.concatenate(
        [box_xyxy, obj[..., None], class_conf_k[..., None], cls_k[..., None]],
        axis=-1,
    )
    # Compact kept rows to the front, preserving score order.
    order = jnp.argsort(~keep, axis=-1, stable=True)
    det = jnp.take_along_axis(det, order[..., None], axis=1)
    keep = jnp.take_along_axis(keep, order, axis=1)
    if k < max_det:
        det = jnp.pad(det, ((0, 0), (0, max_det - k), (0, 0)))
        keep = jnp.pad(keep, ((0, 0), (0, max_det - k)))
    return det, keep
