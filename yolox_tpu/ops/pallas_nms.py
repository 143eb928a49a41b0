"""Pallas TPU kernel for greedy NMS suppression.

The XLA formulation in `yolox_tpu/ops/nms.py` runs a K-step lax.fori_loop
over a (K, K) IoU matrix; each step is a tiny dynamic-slice + vector op,
so on TPU the loop pays per-iteration overhead against HBM-resident data.
This kernel keeps the whole IoU matrix in VMEM (K=1024 f32 -> 4 MB, within
the ~16 MB budget) and runs the sequential suppression loop entirely
on-core.

Semantics identical to `_greedy_suppress` (and torchvision): boxes are
score-sorted, suppression is strict iou > threshold, class-aware NMS is
handled by the caller's coordinate-offset trick.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _nms_kernel(thr_ref, boxes_ref, valid_ref, keep_ref, sup_ref):
    """boxes (K, 4) score-sorted; valid/keep (1, K) int32 masks; sup_ref is
    a (K, K) VMEM scratch holding the suppression matrix (Mosaic can only
    dynamically slice through a Ref, not a value)."""
    k = boxes_ref.shape[0]
    thr = thr_ref[0]

    boxes = boxes_ref[:]                      # (K, 4) in VMEM
    x1 = boxes[:, 0:1]                        # (K, 1)
    y1 = boxes[:, 1:2]
    x2 = boxes[:, 2:3]
    y2 = boxes[:, 3:4]
    x1r = jnp.reshape(x1, (1, k))             # (1, K)
    y1r = jnp.reshape(y1, (1, k))
    x2r = jnp.reshape(x2, (1, k))
    y2r = jnp.reshape(y2, (1, k))

    iw = jnp.maximum(
        jnp.minimum(x2, x2r) - jnp.maximum(x1, x1r), 0.0)   # (K, K)
    ih = jnp.maximum(
        jnp.minimum(y2, y2r) - jnp.maximum(y1, y1r), 0.0)
    inter = iw * ih
    area = (x2 - x1) * (y2 - y1)              # (K, 1)
    union = area + jnp.reshape(area, (1, k)) - inter
    # strict tl<br semantics of the reference IoU: inter>0 check is implied
    # by the clamped products; guard the 0/0 case
    iou = jnp.where(union > 0, inter / union, 0.0)
    sup_ref[:] = (iou > thr).astype(jnp.int32)              # (K, K)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)    # (1, K)

    def body(i, keep):
        # keep[i] via masked reduction (dynamic lane indexing is awkward)
        keep_i = jnp.sum(jnp.where(col == i, keep, 0))
        row = sup_ref[pl.ds(i, 1), :]                       # (1, K)
        suppress = (row * keep_i) * (col > i).astype(jnp.int32)
        return keep * (1 - suppress)

    keep = jax.lax.fori_loop(0, k, body, valid_ref[:])
    keep_ref[:] = keep


@functools.partial(jax.jit, static_argnames=("interpret",))
def nms_pallas(boxes, scores, iou_threshold, valid=None, interpret=False):
    """Greedy NMS on score-sorted boxes (K, 4). Returns keep mask (K,) bool.

    K must be a multiple of 128 for efficient TPU tiling (the caller pads).
    """
    k = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((k,), bool)
    thr = jnp.asarray(iou_threshold, jnp.float32).reshape(1)

    keep = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((k, k), jnp.int32)],
        interpret=interpret,
    )(thr, boxes.astype(jnp.float32),
      valid.astype(jnp.int32).reshape(1, k))
    return keep.reshape(k).astype(bool)


def pallas_available() -> bool:
    if not _HAS_PALLAS:
        return False
    return jax.default_backend() == "tpu"
