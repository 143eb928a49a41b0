"""Detection losses — re-design of `/root/reference/yolox/models/losses.py`.

Pure jnp functions over matched (pred, target) pairs in cxcywh format.
"""

from __future__ import annotations

import jax.numpy as jnp


def iou_loss(pred, target, loss_type: str = "iou", eps: float = 1e-7):
    """Elementwise IoU loss for matched cxcywh boxes (`losses.py:21-51`).

    loss_type "iou": 1 - iou^2;  "giou": 1 - clamp(giou, -1, 1).
    Returns per-pair loss (no reduction).
    """
    tl = jnp.maximum(pred[..., :2] - pred[..., 2:4] / 2,
                     target[..., :2] - target[..., 2:4] / 2)
    br = jnp.minimum(pred[..., :2] + pred[..., 2:4] / 2,
                     target[..., :2] + target[..., 2:4] / 2)

    area_p = jnp.prod(pred[..., 2:4], axis=-1)
    area_g = jnp.prod(target[..., 2:4], axis=-1)

    en = jnp.all(tl < br, axis=-1).astype(tl.dtype)
    area_i = jnp.prod(br - tl, axis=-1) * en
    area_u = area_p + area_g - area_i
    iou = area_i / (area_u + eps)

    if loss_type == "iou":
        return 1 - iou ** 2
    elif loss_type == "giou":
        c_tl = jnp.minimum(pred[..., :2] - pred[..., 2:4] / 2,
                           target[..., :2] - target[..., 2:4] / 2)
        c_br = jnp.maximum(pred[..., :2] + pred[..., 2:4] / 2,
                           target[..., :2] + target[..., 2:4] / 2)
        area_c = jnp.prod(c_br - c_tl, axis=-1)
        giou = iou - (area_c - area_u) / jnp.clip(area_c, min=eps)
        return 1 - jnp.clip(giou, -1.0, 1.0)
    raise ValueError(f"unknown loss_type: {loss_type}")


def bce_with_logits(logits, targets):
    """BCEWithLogitsLoss(reduction='none'), numerically stable."""
    return (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))
