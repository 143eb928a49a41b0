"""Box format conversions and IoU — JAX re-design of `/root/reference/yolox/utils/boxes.py`.

Unlike the reference these are pure (out-of-place) and jit/vmap friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def cxcywh2xyxy(boxes):
    """(cx, cy, w, h) -> (x1, y1, x2, y2); pure (reference mutates in place)."""
    cx, cy, w, h = (boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3])
    return jnp.stack(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1)


def xyxy2cxcywh(boxes):
    x1, y1, x2, y2 = (boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3])
    w = x2 - x1
    h = y2 - y1
    return jnp.stack([x1 + w * 0.5, y1 + h * 0.5, w, h], axis=-1)


def xyxy2xywh(boxes):
    x1, y1, x2, y2 = (boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3])
    return jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)


def pairwise_iou_xyxy(a, b, eps: float = 0.0):
    """Pairwise IoU of xyxy boxes a (N,4) x b (M,4) -> (N, M).

    torchvision-compatible (no +1 on extents), intersection counted only when
    strictly tl < br (matches `boxes.py:99`).
    """
    tl = jnp.maximum(a[:, None, :2], b[None, :, :2])
    br = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    area_a = jnp.prod(a[:, 2:] - a[:, :2], axis=1)
    area_b = jnp.prod(b[:, 2:] - b[:, :2], axis=1)
    en = jnp.all(tl < br, axis=2).astype(a.dtype)
    area_i = jnp.prod(br - tl, axis=2) * en
    return area_i / (area_a[:, None] + area_b[None, :] - area_i + eps)


def bboxes_iou(bboxes_a, bboxes_b, xyxy: bool = True):
    """Pairwise IoU, xyxy or cxcywh inputs (`boxes.py:78-101`)."""
    if xyxy:
        return pairwise_iou_xyxy(bboxes_a, bboxes_b)
    return pairwise_iou_xyxy(cxcywh2xyxy(bboxes_a), cxcywh2xyxy(bboxes_b))


def filter_box(output, scale_range):
    """Keep rows whose box area is within (min_scale^2, max_scale^2)
    (`boxes.py:20-28`). output: (N, >=4) xyxy rows."""
    min_scale, max_scale = scale_range
    w = output[:, 2] - output[:, 0]
    h = output[:, 3] - output[:, 1]
    keep = (w * h > min_scale * min_scale) & (w * h < max_scale * max_scale)
    return output[keep]


def matrix_iou(a, b, eps: float = 1e-12):
    """Pairwise IoU for numpy xyxy boxes (`boxes.py:104-114`), used by
    data augmentation."""
    import numpy as np

    lt = np.maximum(a[:, np.newaxis, :2], b[:, :2])
    rb = np.minimum(a[:, np.newaxis, 2:], b[:, 2:])
    area_i = np.prod(rb - lt, axis=2) * (lt < rb).all(axis=2)
    area_a = np.prod(a[:, 2:] - a[:, :2], axis=1)
    area_b = np.prod(b[:, 2:] - b[:, :2], axis=1)
    return area_i / (area_a[:, np.newaxis] + area_b - area_i + eps)
