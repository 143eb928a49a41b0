"""Detection losses — re-design of `/root/reference/yolox/models/losses.py`.

Pure jnp functions over matched (pred, target) pairs in cxcywh format.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def iou_loss(pred, target, loss_type: str = "iou", eps: float = 1e-7):
    """Elementwise IoU loss for matched cxcywh boxes (`losses.py:21-51`).

    loss_type "iou": 1 - iou^2;  "giou": 1 - clamp(giou, -1, 1).
    Returns per-pair loss (no reduction).

    The math runs on per-coordinate (..., ) arrays rather than (..., 2) /
    (..., 4) stacks: a 2- or 4-wide minor dim occupies 2/128 TPU lanes,
    and the stacked form showed up as multi-ms fusions in the train-step
    trace. Unpacking makes the (large) anchor axis minor and fully tiled.
    """
    px, py, pw, ph = (pred[..., i] for i in range(4))
    tx, ty, tw, th = (target[..., i] for i in range(4))

    tl_x = jnp.maximum(px - pw / 2, tx - tw / 2)
    tl_y = jnp.maximum(py - ph / 2, ty - th / 2)
    br_x = jnp.minimum(px + pw / 2, tx + tw / 2)
    br_y = jnp.minimum(py + ph / 2, ty + th / 2)

    area_p = pw * ph
    area_g = tw * th

    en = ((tl_x < br_x) & (tl_y < br_y)).astype(pred.dtype)
    area_i = (br_x - tl_x) * (br_y - tl_y) * en
    area_u = area_p + area_g - area_i
    iou = area_i / (area_u + eps)

    if loss_type == "iou":
        return 1 - iou ** 2
    elif loss_type == "giou":
        c_w = (jnp.maximum(px + pw / 2, tx + tw / 2)
               - jnp.minimum(px - pw / 2, tx - tw / 2))
        c_h = (jnp.maximum(py + ph / 2, ty + th / 2)
               - jnp.minimum(py - ph / 2, ty - th / 2))
        area_c = c_w * c_h
        giou = iou - (area_c - area_u) / jnp.clip(area_c, min=eps)
        return 1 - jnp.clip(giou, -1.0, 1.0)
    raise ValueError(f"unknown loss_type: {loss_type}")


@jax.custom_jvp
def bce_with_logits(logits, targets):
    """BCEWithLogitsLoss(reduction='none'), numerically stable."""
    return (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


@bce_with_logits.defjvp
def _bce_with_logits_jvp(primals, tangents):
    # closed-form gradient: d/dlogits = sigmoid(logits) - targets,
    # d/dtargets = -logits. Autodiff of the stable 3-term primal instead
    # materializes several full-size intermediates in the backward
    # (measured ~4 GB/step over the (B, 8400, C) loss tensors).
    logits, targets = primals
    dl, dt = tangents
    out = bce_with_logits(logits, targets)
    grad_l = jax.nn.sigmoid(logits) - targets
    return out, grad_l * dl + (-logits) * dt
