"""Letterbox preprocessing — numerically identical to the reference
`preproc` (`/root/reference/yolox/data/data_augment.py:140-156`):

  r = min(target_h / h, target_w / w)
  cv2 INTER_LINEAR resize to (round-down w*r, h*r), cast uint8,
  paste top-left into a 114-filled canvas, float32 — no normalization.

The reference emits CHW; we emit HWC (NHWC batches are TPU-native). A
`device_letterbox` variant does the resize on-TPU for the batched serving
path.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def _resize_linear(img: np.ndarray, size_wh: Tuple[int, int]) -> np.ndarray:
    if _HAS_CV2:
        return cv2.resize(img, size_wh, interpolation=cv2.INTER_LINEAR)
    # PIL fallback (BILINEAR differs from cv2 at <1 ulp for uint8 in rare
    # pixels; cv2 is present in the supported environment).
    from PIL import Image

    return np.asarray(
        Image.fromarray(img).resize(size_wh, Image.BILINEAR))


def letterbox_ratio(image_hw, target_hw) -> float:
    """The canonical letterbox scale r = min(th/h, tw/w).

    Single source of truth for every consumer that must invert the
    letterbox (processor postprocess, evaluators) — the formula must match
    `preproc` exactly or boxes skew.
    """
    return min(target_hw[0] / image_hw[0], target_hw[1] / image_hw[1])


def preproc(img: np.ndarray, input_size, swap=None):
    """Letterbox an HWC uint8 image to `input_size` (h, w).

    Returns (padded float32 image, ratio). Layout HWC unless `swap` given
    (e.g. (2, 0, 1) for the reference's CHW).
    """
    if len(img.shape) == 3:
        padded_img = np.ones(
            (input_size[0], input_size[1], 3), dtype=np.uint8) * 114
    else:
        padded_img = np.ones(input_size, dtype=np.uint8) * 114

    r = letterbox_ratio(img.shape[:2], input_size)
    resized_img = _resize_linear(
        img, (int(img.shape[1] * r), int(img.shape[0] * r))
    ).astype(np.uint8)
    padded_img[: int(img.shape[0] * r), : int(img.shape[1] * r)] = resized_img

    if swap is not None:
        padded_img = padded_img.transpose(swap)
    return np.ascontiguousarray(padded_img, dtype=np.float32), r
