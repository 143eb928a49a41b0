"""SimOTA dynamic label assignment + training losses, batched for TPU.

Re-design of the reference assignment/loss stack
(`/root/reference/yolox/models/yolo_head.py:253-574`). The reference loops
over images in Python and boolean-indexes candidate anchors (dynamic
shapes); here the whole batch is one fixed-shape vmapped computation:

  - padded ground-truth labels (M, 5) rows of (cls, cx, cy, w, h), zero rows
    = padding (the reference data pipeline already pads to max_labels,
    `data_augment.py:203-207`; `nlabel` semantics of `yolo_head.py:269`).
  - **dense by default, compaction opt-in**: the geometry constraint
    admits at most ~27 anchors per gt (a 3x3 window on each of 3 pyramid
    levels), so the (M, A) matching matrices can be compacted to a fixed
    top-N candidate slice (the fixed-shape analog of the reference's
    boolean gather, `yolo_head.py:459`).  Measured on a v5e, though, the
    dense form WINS at every production size — the top_k sort + gathers
    cost more than the larger fused cost matrices save (yolox-s b64 640px
    full step: dense 591 img/s vs 550 at N=2048 / 501 at N=4096; tiny
    416px: 847 vs 754; nano: 524 vs 488) — so `num_candidates=None`
    (dense, always exact) is the default and compaction is an explicit
    memory/speed knob for cap < A.  Dense also sidesteps a TPU kernel
    fault observed with full-length top_k at unaligned A (3549 at 416px).
  - dynamic-k selection via a fixed top-10 + rank mask
    (dynamic_k <= 10 always: it is int(sum of top-10 IoUs) <= 10),
  - conflict resolution via argmin over the gt axis.

All assignment outputs are stop_gradient'ed (the reference runs assignment
under @torch.no_grad, `yolo_head.py:420`).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from yolox_tpu.models.losses import bce_with_logits, iou_loss

BIG = 1e9          # excludes non-candidate anchors / padded gts from matching
GEOM_PENALTY = 1e6  # reference's soft penalty for outside-center candidates
CENTER_RADIUS = 1.5
N_CANDIDATE_K = 10
# default: dense-exact assignment over all anchors (see module docstring);
# set num_candidates to an int to opt into candidate compaction
NUM_CANDIDATES = None


def _pairwise_iou_cxcywh(gt, pred):
    """IoU of gt (G,4) x pred (N,4), cxcywh, reference formula
    (`boxes.py:88-101`): strict tl<br intersection, no eps."""
    tl = jnp.maximum(gt[:, None, :2] - gt[:, None, 2:] / 2,
                     pred[None, :, :2] - pred[None, :, 2:] / 2)
    br = jnp.minimum(gt[:, None, :2] + gt[:, None, 2:] / 2,
                     pred[None, :, :2] + pred[None, :, 2:] / 2)
    area_g = jnp.prod(gt[:, 2:], axis=1)
    area_p = jnp.prod(pred[:, 2:], axis=1)
    en = jnp.all(tl < br, axis=2).astype(gt.dtype)
    area_i = jnp.prod(br - tl, axis=2) * en
    return area_i / (area_g[:, None] + area_p[None, :] - area_i)


def _clamped_log(x):
    """log with torch BCE's -100 clamp (F.binary_cross_entropy)."""
    return jnp.maximum(jnp.log(x), -100.0)


def _topk_iterative(vals, k: int):
    """top-k of each row of (M, N), descending, ties -> lowest index
    (exactly lax.top_k's order). k passes of fused argmax/mask instead
    of the full sort lax.top_k lowers to on TPU — a (64x120, 2048) sort
    costs ~log^2(N) passes; this costs 2k.
    """
    m, n = vals.shape
    col = jnp.arange(n)
    v = vals
    out_v, out_i = [], []
    for _ in range(k):
        i = jnp.argmax(v, axis=1)                       # (M,) first max
        out_v.append(jnp.max(v, axis=1))
        out_i.append(i)
        v = jnp.where(col[None, :] == i[:, None], -jnp.inf, v)
    return jnp.stack(out_v, axis=1), jnp.stack(out_i, axis=1)


def simota_assign(
    gt_labels,          # (M, 5): (cls, cx, cy, w, h); zero rows = padding
    bbox_preds,         # (A, 4) cxcywh, image space
    obj_logits,         # (A,)
    cls_logits,         # (A, C)
    x_shifts,           # (A,)
    y_shifts,           # (A,)
    strides,            # (A,)
    num_classes: int,
    num_candidates: int | None = NUM_CANDIDATES,
) -> Dict[str, jnp.ndarray]:
    """Single-image SimOTA. vmap over the batch dimension.

    num_candidates None (default) = dense-exact over all A anchors.

    Returns (all fixed-shape; N = min(num_candidates, A) compacted slots):
      fg_mask: (A,) bool — anchors assigned to some gt
      matched_gt: (A,) int32 — index of matched gt (0 where ~fg)
      matched_iou: (A,) f32 — IoU with matched gt (0 where ~fg)
      num_fg: () f32, num_gt: () f32
      cand_idx: (N,) int32 — anchor index per candidate slot
      fg_cand: (N,) bool, matched_gt_cand: (N,) int32,
      matched_iou_cand: (N,) f32 — candidate-space views (for loss terms
      that are zero off-candidate; every fg anchor is a candidate).
    """
    gt_mask = jnp.sum(gt_labels, axis=1) > 0           # (M,)
    gt_cls = gt_labels[:, 0].astype(jnp.int32)
    gt_boxes = gt_labels[:, 1:5]
    a = bbox_preds.shape[0]
    m = gt_labels.shape[0]
    n = a if num_candidates is None else min(num_candidates, a)

    # ---- geometry constraint (`yolo_head.py:511-540`) ----
    xc = (x_shifts + 0.5) * strides                     # (A,)
    yc = (y_shifts + 0.5) * strides
    radius = CENTER_RADIUS * strides                    # (A,)
    # (A window-scatter formulation — O(M*75) scatters instead of these
    # O(M*A) compares — measured SLOWER on TPU v5e: XLA fuses the dense
    # compare+reduce, while scatters serialize. Dense it stays.)
    candidate = jnp.any(
        (jnp.abs(xc[None, :] - gt_boxes[:, 0:1]) < radius[None, :])
        & (jnp.abs(yc[None, :] - gt_boxes[:, 1:2]) < radius[None, :])
        & gt_mask[:, None],
        axis=0,
    )                                                    # (A,)

    # ---- compact candidates to N fixed slots ----
    if n >= a:
        # Cap covers every anchor: compaction is the identity. Skipping
        # top_k both saves the sort and avoids a TPU kernel fault seen
        # with full-length top_k at unaligned A (e.g. 3549 at 416px).
        cand_idx = jnp.arange(a, dtype=jnp.int32)
        cand_valid = candidate                          # (A,)
    else:
        # top_k on the mask picks every true candidate first (stable,
        # index order); slots past the true count carry cand_valid=False.
        cand_score, cand_idx = jax.lax.top_k(candidate.astype(jnp.int32), n)
        cand_valid = cand_score > 0                     # (N,)
    preds_c = jnp.take(bbox_preds, cand_idx, axis=0)             # (N, 4)
    obj_c = jnp.take(obj_logits, cand_idx, axis=0)               # (N,)
    cls_c = jnp.take(cls_logits, cand_idx, axis=0)               # (N, C)
    slot_ok = cand_valid[None, :] & gt_mask[:, None]             # (M, N)
    # per-gt center membership, recomputed on the compacted slots only
    xc_c = jnp.take(xc, cand_idx)
    yc_c = jnp.take(yc, cand_idx)
    rad_c = jnp.take(radius, cand_idx)
    in_center = (
        (jnp.abs(xc_c[None, :] - gt_boxes[:, 0:1]) < rad_c[None, :])
        & (jnp.abs(yc_c[None, :] - gt_boxes[:, 1:2]) < rad_c[None, :])
        & gt_mask[:, None]
    )                                                    # (M, N)

    # ---- pairwise IoU over candidates (`yolo_head.py:461`) ----
    ious = _pairwise_iou_cxcywh(gt_boxes, preds_c)      # (M, N)
    ious = jnp.where(slot_ok, ious, 0.0)

    # ---- classification cost, fp32 (`yolo_head.py:472-480`) ----
    p = jnp.sqrt(
        jax.nn.sigmoid(cls_c.astype(jnp.float32))
        * jax.nn.sigmoid(obj_c.astype(jnp.float32))[:, None]
    )                                                   # (N, C)
    # sum_c BCE(p_c, onehot_g) = -sum_c log(1-p_c) - log(p_g) + log(1-p_g)
    # (O(N*C + M*N) instead of materializing the (M, N, C) BCE tensor;
    # the per-gt column pick runs as a one-hot matmul on the MXU — a
    # column gather of (N, C) by M indices runs on the scalar core)
    log_p = _clamped_log(p)
    log_1mp = _clamped_log(1.0 - p)
    s_neg = -jnp.sum(log_1mp, axis=1)                   # (N,)
    onehot_cls = jax.nn.one_hot(gt_cls, log_p.shape[1],
                                dtype=jnp.float32)      # (M, C)
    lp_g = jnp.einsum("nc,mc->mn", log_p, onehot_cls)   # (M, N)
    l1mp_g = jnp.einsum("nc,mc->mn", log_1mp, onehot_cls)
    cls_cost = s_neg[None, :] - lp_g + l1mp_g           # (M, N)

    iou_cost = -jnp.log(ious + 1e-8)
    cost = (
        cls_cost
        + 3.0 * iou_cost
        + GEOM_PENALTY * (~in_center).astype(jnp.float32)
    )
    # Exclude padded slots / padded gts outright (the reference gathers
    # candidates instead; BIG dominates any candidate cost).
    cost = jnp.where(slot_ok, cost, BIG)

    # ---- dynamic-k matching (`yolo_head.py:542-574`) ----
    k_pool = min(N_CANDIDATE_K, n)
    topk_ious, _ = _topk_iterative(ious, k_pool)        # (M, k_pool)
    dynamic_ks = jnp.clip(
        jnp.sum(topk_ious, axis=1).astype(jnp.int32), 1, None)  # (M,)

    neg_cost_topv, topk_idx = _topk_iterative(-cost, k_pool)    # (M, k_pool)
    rank = jnp.arange(k_pool)[None, :]
    select = (rank < dynamic_ks[:, None]) & gt_mask[:, None]    # (M, k_pool)
    # never select a masked-out slot (pathological no-candidate case)
    select &= neg_cost_topv > -BIG / 2

    # matching[m, slot] = any rank r with topk_idx[m, r] == slot chosen —
    # dense compare instead of a per-row scatter (sort-based on TPU)
    matching = jnp.any(
        (topk_idx[:, :, None] == jnp.arange(n)[None, None, :])
        & select[:, :, None],
        axis=1,
    )                                                    # (M, N)

    # conflict resolution: slot matched by >1 gt -> keep argmin cost
    n_match = jnp.sum(matching, axis=0)                  # (N,)
    cost_masked = jnp.where(matching, cost, BIG)
    best_gt = jnp.argmin(cost_masked, axis=0)            # (N,)
    onehot_best = jax.nn.one_hot(best_gt, m, dtype=jnp.bool_).T
    matching = jnp.where(n_match[None, :] > 1, onehot_best, matching)

    fg_cand = jnp.any(matching, axis=0)                  # (N,)
    matched_gt_cand = jnp.argmax(matching, axis=0).astype(jnp.int32)
    matched_iou_cand = jnp.sum(jnp.where(matching, ious, 0.0), axis=0)

    # ---- scatter candidate results back to anchor space ----
    fg_mask = jnp.zeros((a,), jnp.bool_).at[cand_idx].set(fg_cand)
    matched_gt = jnp.zeros((a,), jnp.int32).at[cand_idx].set(
        jnp.where(fg_cand, matched_gt_cand, 0))
    matched_iou = jnp.zeros((a,), jnp.float32).at[cand_idx].set(
        jnp.where(fg_cand, matched_iou_cand, 0.0))

    out = {
        "fg_mask": fg_mask,
        "matched_gt": matched_gt,
        "matched_iou": matched_iou,
        "num_fg": jnp.sum(fg_cand).astype(jnp.float32),
        "num_gt": jnp.sum(gt_mask).astype(jnp.float32),
        "cand_idx": cand_idx,
        "fg_cand": fg_cand,
        "matched_gt_cand": matched_gt_cand,
        "matched_iou_cand": matched_iou_cand,
        # telemetry: true candidate count (compaction is exact iff <= N)
        "num_cand": jnp.sum(candidate).astype(jnp.float32),
    }
    return jax.tree.map(jax.lax.stop_gradient, out)


def compute_losses(
    head_out: Dict[str, jnp.ndarray],
    labels,                       # (B, M, 5)
    num_classes: int,
    use_l1: bool = False,
    num_candidates: int | None = NUM_CANDIDATES,
) -> Dict[str, jnp.ndarray]:
    """Batched YOLOX losses (`yolo_head.py:253-411`).

    head_out is the dict from YoloxHead.forward_train. Returns the same loss
    dict the reference trainer logs: total_loss, iou_loss, l1_loss,
    conf_loss, cls_loss, num_fg (fg-per-gt ratio).

    The cls/IoU/L1 terms are summed DENSELY over all A anchors, masked by
    fg (they are identically zero off-fg, so the sum equals the
    reference's fg-gathered sum). Dense beats gathered on TPU: the
    backward of a candidate gather is a scatter-add into (B, A, C) —
    measured 7 ms/step of kCustom scatter fusions on a yolox-s b64 step —
    while the dense formulation's backward is elementwise and fuses into
    the head's existing (B, A, C) pipelines. The only gathers left index
    the tiny (B, M) gt tensors with the stop_gradient'ed assignment.
    """
    outputs = head_out["outputs"].astype(jnp.float32)   # (B, A, 5+C)
    bbox_preds = outputs[..., :4]
    obj_logits = outputs[..., 4]
    cls_logits = outputs[..., 5:]
    x_shifts = head_out["x_shifts"].astype(jnp.float32)
    y_shifts = head_out["y_shifts"].astype(jnp.float32)
    strides = head_out["expanded_strides"].astype(jnp.float32)

    assign = jax.vmap(
        lambda lab, bp, ol, cl: simota_assign(
            lab, bp, ol, cl, x_shifts, y_shifts, strides, num_classes,
            num_candidates=num_candidates)
    )(labels.astype(jnp.float32), bbox_preds, obj_logits, cls_logits)

    fg_f = assign["fg_mask"].astype(jnp.float32)         # (B, A)
    matched_gt = assign["matched_gt"]                    # (B, A)
    num_fg_total = jnp.maximum(jnp.sum(assign["num_fg"]), 1.0)
    num_gts_total = jnp.maximum(jnp.sum(assign["num_gt"]), 1.0)

    gt_boxes = labels[..., 1:5].astype(jnp.float32)      # (B, M, 4)
    gt_cls = labels[..., 0].astype(jnp.int32)            # (B, M)

    # gt lookups as one-hot matmuls, not take_along_axis: a per-anchor
    # gather from the tiny (B, M) gt tables runs on the TPU scalar core
    # (measured 7.7 ms/step); an (A, M) x (M, k) einsum rides the MXU and
    # is exact (one-hot rows select a single f32 value, no rounding).
    onehot_gt = jax.nn.one_hot(matched_gt, gt_cls.shape[1],
                               dtype=jnp.float32)        # (B, A, M)
    reg_target = jnp.einsum(
        'bam,bmk->bak', onehot_gt, gt_boxes)             # (B, A, 4)
    onehot_gtcls = jax.nn.one_hot(
        gt_cls, num_classes, dtype=jnp.float32)          # (B, M, C)
    cls_target = (
        jnp.einsum('bam,bmc->bac', onehot_gt, onehot_gtcls)
        * assign["matched_iou"][..., None]
    )                                                    # (B, A, C)

    loss_iou = jnp.sum(
        iou_loss(bbox_preds, reg_target) * fg_f) / num_fg_total
    loss_obj = jnp.sum(
        bce_with_logits(obj_logits, fg_f)) / num_fg_total
    loss_cls = jnp.sum(
        jnp.sum(bce_with_logits(cls_logits, cls_target), axis=-1) * fg_f
    ) / num_fg_total

    if use_l1:
        # grid-space L1 target (`yolo_head.py:413-418`)
        eps = 1e-8
        l1_target = jnp.stack(
            [
                reg_target[..., 0] / strides - x_shifts,
                reg_target[..., 1] / strides - y_shifts,
                jnp.log(reg_target[..., 2] / strides + eps),
                jnp.log(reg_target[..., 3] / strides + eps),
            ],
            axis=-1,
        )
        origin_reg = head_out["origin_reg"].astype(jnp.float32)
        loss_l1 = jnp.sum(
            jnp.sum(jnp.abs(origin_reg - l1_target), axis=-1) * fg_f
        ) / num_fg_total
    else:
        loss_l1 = jnp.float32(0.0)

    reg_weight = 5.0
    total = reg_weight * loss_iou + loss_obj + loss_cls + loss_l1
    return {
        "total_loss": total,
        "iou_loss": reg_weight * loss_iou,
        "l1_loss": loss_l1,
        "conf_loss": loss_obj,
        "cls_loss": loss_cls,
        "num_fg": jnp.sum(assign["num_fg"]) / num_gts_total,
        # fraction of images whose candidate set overflowed the compaction
        # cap (assignment deviates from the reference only when > 0)
        "cand_overflow": jnp.mean(
            (assign["num_cand"]
             > assign["cand_idx"].shape[-1]).astype(jnp.float32)),
    }
