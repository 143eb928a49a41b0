"""Device-side Mosaic/affine/MixUp/HSV/flip augmentation.

TPU-first alternative to the host cv2 pipeline
(`yolox_tpu/data/datasets/mosaicdetection.py`, reference
`yolox/data/datasets/mosaicdetection.py:35-232`): the host only decodes and
pre-resizes JPEGs (cheap, cacheable); all geometry and photometric
augmentation runs on the TPU as one jitted batch op.

Why: mosaic+affine in cv2 costs ~80 ms/image/core — a TPU host with
O(100) cores cannot feed 8 chips at ~340 img/s/chip, so real training is
input-bound. The warp itself runs through the TPU-native engine in
`yolox_tpu/ops/pallas_warp.py` (MXU interpolation matmuls + Pallas shear
kernels — arbitrary per-pixel gathers serialize on TPU); labels go through
the exact same composed transform in closed form. A gather-based
single-pass reference warp (`mosaic_warp`/`warp_affine` below) is kept
for tests and non-TPU use.

Semantics follow the reference formulas exactly (same mosaic paste
geometry, same affine matrix construction, same label clipping/filtering);
sampling uses jax.random instead of per-worker numpy RNGs, and bilinear
interpolation is float (cv2 uses 5-bit fixed point), so streams are not
bit-identical to the host pipeline — they are the same distribution.

Input contract per sample (prepared by `TileBatcher`, host side, memcpy
only): 4 mosaic tiles + 1 mixup partner tile, each pre-resized to fit
(S, S) and zero-padded, plus their true (h, w) and padded xyxy labels.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PAD = 114.0


class TileDataset:
    """Host side of the device pipeline: serves RAW tiles, no augmentation.

    Each item is (tiles (5, T, T, 3) uint8, labels (5, L, 5) f32 xyxy+cls,
    tile_hw (5, 2) f32, img_id): the sample's own image, 3 mosaic partners,
    and a mixup partner (guaranteed to have labels, as in the reference's
    retry loop), each pre-resized by the wrapped dataset's pull_item and
    zero-padded to (T, T). All actual augmentation happens on the TPU
    (`device_augment_batch`). Work per image is decode+memcpy — the ~80 ms
    of cv2 mosaic/affine per image disappears from the host.
    """

    def __init__(self, dataset, tile_size: int, max_labels_per_tile: int = 60):
        self._dataset = dataset
        self.tile_size = int(tile_size)
        self.max_labels = int(max_labels_per_tile)
        self.enable_mosaic = True  # close_mosaic() compatibility
        self.input_dim = (self.tile_size, self.tile_size)

    def __len__(self):
        return len(self._dataset)

    def _pull(self, index):
        img, labels, _, img_id = self._dataset.pull_item(index)
        t = self.tile_size
        h, w = img.shape[0], img.shape[1]
        if h > t or w > t:  # defensive: pull_item pre-resizes to <= t
            import cv2

            r = min(t / h, t / w)
            img = cv2.resize(img, (int(w * r), int(h * r)))
            labels = labels.copy()
            labels[:, :4] *= r
            h, w = img.shape[0], img.shape[1]
        tile = np.zeros((t, t, 3), np.uint8)
        tile[:h, :w] = img
        lab = np.zeros((self.max_labels, 5), np.float32)
        n = min(len(labels), self.max_labels)
        lab[:n] = labels[:n]
        return tile, lab, (h, w), img_id

    def __getitem__(self, index):
        if not isinstance(index, int):  # (mosaic_flag, idx[, seed]) tuples
            seed = index[2] if len(index) > 2 else None
            rng = np.random.default_rng(seed)
            index = index[1]
        else:
            rng = np.random.default_rng()
        n = len(self._dataset)
        indices = [index] + [int(rng.integers(0, n)) for _ in range(3)]
        # mixup partner must have labels (reference retry loop,
        # `mosaicdetection.py:137-140`)
        while True:
            mix_idx = int(rng.integers(0, n))
            if len(self._dataset.load_anno(mix_idx)) > 0:
                break
        indices.append(mix_idx)

        tiles = np.zeros((5, self.tile_size, self.tile_size, 3), np.uint8)
        labels = np.zeros((5, self.max_labels, 5), np.float32)
        hw = np.zeros((5, 2), np.float32)
        img_id = None
        for i, idx in enumerate(indices):
            tiles[i], labels[i], hw_i, iid = self._pull(idx)
            hw[i] = hw_i
            if i == 0:
                img_id = iid
        return tiles, labels, hw, img_id


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def affine_inverse(m):
    """Inverse of a 2x3 affine matrix (rows [a b tx; c d ty])."""
    a, b, tx = m[0]
    c, d, ty = m[1]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    return jnp.stack([jnp.stack([ia, ib, itx]),
                      jnp.stack([ic, id_, ity])])


def random_affine_matrix(key, target_size: Tuple[int, int], degrees=10.0,
                         translate=0.1, scales=(0.5, 1.5), shear=2.0):
    """The reference affine construction (`data_augment.py:44-77`):
    rotation*scale, then shear mixed into rows, then translate."""
    tw, th = target_size[1], target_size[0]
    ks = jax.random.split(key, 5)
    angle = jax.random.uniform(ks[0], (), minval=-degrees, maxval=degrees)
    scale = jax.random.uniform(ks[1], (), minval=scales[0], maxval=scales[1])
    rad = angle * (math.pi / 180.0)
    cos, sin = jnp.cos(rad) * scale, jnp.sin(rad) * scale
    # cv2.getRotationMatrix2D(center=(0,0), angle, scale): [[cos, sin],
    # [-sin, cos]] (y-down image coords rotate counter-clockwise)
    r0 = jnp.stack([cos, sin])
    r1 = jnp.stack([-sin, cos])
    sx = jnp.tan(jax.random.uniform(
        ks[2], (), minval=-shear, maxval=shear) * (math.pi / 180.0))
    sy = jnp.tan(jax.random.uniform(
        ks[3], (), minval=-shear, maxval=shear) * (math.pi / 180.0))
    t = jax.random.uniform(ks[4], (2,), minval=-translate, maxval=translate)
    m0 = r0 + sy * r1
    m1 = r1 + sx * r0
    return jnp.stack([jnp.concatenate([m0, (t[0] * tw)[None]]),
                      jnp.concatenate([m1, (t[1] * th)[None]])]), scale


def _bilinear_gather(img, xs, ys, pad_value=PAD):
    """Sample img (H, W, 3) at float coords; out-of-bounds reads pad_value
    (cv2.warpAffine BORDER_CONSTANT semantics)."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0)[..., None]
    fy = (ys - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inside[..., None], v.astype(jnp.float32), pad_value)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def warp_affine(img, m, out_size: Tuple[int, int], pad_value=PAD):
    """cv2.warpAffine(img, m, dsize, borderValue=114) on device: for each
    destination pixel, sample the source at m^-1 (cv2 warps src->dst with
    m, i.e. reads src at the inverse map)."""
    oh, ow = out_size
    minv = affine_inverse(m)
    ys, xs = jnp.mgrid[0:oh, 0:ow].astype(jnp.float32)
    sx = minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]
    sy = minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]
    return _bilinear_gather(img, sx, sy, pad_value)


# ---------------------------------------------------------------------------
# mosaic: 4 tiles -> affine-warped (S, S) output, canvas never materialized
# ---------------------------------------------------------------------------

def _mosaic_geometry(tile_hw, xc, yc, s_h, s_w):
    """Per-tile paste rectangles in the 2x canvas + source offsets —
    branch-free port of `get_mosaic_coordinate` (mosaicdetection.py:20).
    tile_hw: (4, 2) float (h, w) of each pre-resized tile.
    Returns paste (4, 4) [x1, y1, x2, y2] and offset (4, 2) [padw, padh]
    with canvas coord q sampling tile t at u = q - offset_t."""
    h = tile_hw[:, 0]
    w = tile_hw[:, 1]
    zero = jnp.zeros(())
    x1 = jnp.stack([jnp.maximum(xc - w[0], 0), xc,
                    jnp.maximum(xc - w[2], 0), xc])
    y1 = jnp.stack([jnp.maximum(yc - h[0], 0), jnp.maximum(yc - h[1], 0),
                    yc, yc])
    x2 = jnp.stack([xc + zero, jnp.minimum(xc + w[1], 2 * s_w),
                    xc + zero, jnp.minimum(xc + w[3], 2 * s_w)])
    y2 = jnp.stack([yc + zero, yc + zero,
                    jnp.minimum(2 * s_h, yc + h[2]),
                    jnp.minimum(2 * s_h, yc + h[3])])
    # source crop origin (s_x1, s_y1) per reference; offset = l1 - s1
    s_x1 = jnp.stack([w[0] - (x2[0] - x1[0]), zero,
                      w[2] - (x2[2] - x1[2]), zero])
    s_y1 = jnp.stack([h[0] - (y2[0] - y1[0]), h[1] - (y2[1] - y1[1]),
                      zero, zero])
    paste = jnp.stack([x1, y1, x2, y2], axis=1)          # (4, 4)
    offset = jnp.stack([x1 - s_x1, y1 - s_y1], axis=1)   # (4, 2)
    return paste, offset


def mosaic_warp(tiles, tile_hw, m, xc, yc, out_size: Tuple[int, int]):
    """Fused mosaic paste + affine warp.

    tiles: (4, T, T, 3) uint8 pre-resized tiles (zero-padded to T=S).
    tile_hw: (4, 2) true (h, w). m: affine 2x3 (canvas -> output).
    Returns (S, S, 3) float32.
    """
    oh, ow = out_size
    paste, offset = _mosaic_geometry(
        tile_hw.astype(jnp.float32), xc, yc, float(oh), float(ow))

    minv = affine_inverse(m)
    ys, xs = jnp.mgrid[0:oh, 0:ow].astype(jnp.float32)
    qx = minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]   # canvas coords
    qy = minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]

    # quadrant by mosaic center: 0 TL, 1 TR, 2 BL, 3 BR
    t = (qx >= xc).astype(jnp.int32) + 2 * (qy >= yc).astype(jnp.int32)

    inside = ((qx >= paste[t, 0]) & (qx < paste[t, 2])
              & (qy >= paste[t, 1]) & (qy < paste[t, 3]))
    hw = tile_hw.astype(jnp.float32)
    # clamp taps to the tile's true content (edge replication) so fractional
    # taps never bleed into the zero padding or an adjacent stacked tile
    ux = jnp.clip(qx - offset[t, 0], 0.0, hw[t, 1] - 1.0)
    uy = jnp.clip(qy - offset[t, 1], 0.0, hw[t, 0] - 1.0)

    # one gather from the stacked tiles: flatten tile index into rows
    big = tiles.reshape(-1, tiles.shape[2], tiles.shape[3])  # (4T, T, 3)
    row = t.astype(jnp.float32) * tiles.shape[1]
    sampled = _bilinear_gather(big, ux, uy + row)
    return jnp.where(inside[..., None], sampled, PAD)


def transform_labels(labels, valid, scale_pad, m, out_size, min_size=1.0):
    """Compose the label pipeline: per-tile scale+pad -> canvas clip ->
    affine corners (`apply_affine_to_bboxes`) -> output clip -> degenerate
    filter. labels: (4, L, 5) xyxy+cls; valid: (4, L) bool;
    scale_pad: (4, 3) [scale, padw, padh]. Returns (4L, 5), (4L,) bool."""
    oh, ow = out_size
    s = scale_pad[:, 0:1, None]
    pad = scale_pad[:, None, 1:3]
    xy1 = labels[..., 0:2] * s + pad
    xy2 = labels[..., 2:4] * s + pad
    boxes = jnp.concatenate([xy1, xy2], axis=-1).reshape(-1, 4)
    cls = labels[..., 4].reshape(-1)
    valid = valid.reshape(-1)

    boxes = jnp.stack([
        jnp.clip(boxes[:, 0], 0, 2 * ow), jnp.clip(boxes[:, 1], 0, 2 * oh),
        jnp.clip(boxes[:, 2], 0, 2 * ow), jnp.clip(boxes[:, 3], 0, 2 * oh),
    ], axis=1)

    # affine on the 4 corners, then min/max envelope
    cx = jnp.stack([boxes[:, 0], boxes[:, 2], boxes[:, 0], boxes[:, 2]], 1)
    cy = jnp.stack([boxes[:, 1], boxes[:, 3], boxes[:, 3], boxes[:, 1]], 1)
    tx = m[0, 0] * cx + m[0, 1] * cy + m[0, 2]
    ty = m[1, 0] * cx + m[1, 1] * cy + m[1, 2]
    nb = jnp.stack([
        jnp.clip(tx.min(1), 0, ow), jnp.clip(ty.min(1), 0, oh),
        jnp.clip(tx.max(1), 0, ow), jnp.clip(ty.max(1), 0, oh),
    ], axis=1)

    keep = valid & ((nb[:, 2] - nb[:, 0]) > min_size) \
        & ((nb[:, 3] - nb[:, 1]) > min_size)
    return jnp.concatenate([nb, cls[:, None]], axis=1), keep


# ---------------------------------------------------------------------------
# photometric + flip + final label packing (TrainTransform analog)
# ---------------------------------------------------------------------------

def hsv_jitter(img, key, hgain=5.0, sgain=30.0, vgain=30.0):
    """HSV jitter matching `augment_hsv` semantics (hue shift mod 180 on
    the cv2 0..179 hue scale, sat/val add + clip). Math runs in f32
    regardless of the input dtype (hue sextants are precision-sensitive);
    the output dtype matches the input, so bf16 engine buffers stay bf16
    with casts fused into the pointwise chain."""
    in_dtype = img.dtype
    img = img.astype(jnp.float32)
    ks = jax.random.split(key, 2)
    gains = jax.random.uniform(ks[0], (3,), minval=-1.0, maxval=1.0) \
        * jnp.asarray([hgain, sgain, vgain])
    gains = gains * jax.random.bernoulli(ks[1], 0.5, (3,))
    # RGB<->HSV in cv2 uint8 scale: h in [0,180), s/v in [0,255]
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    d = maxc - minc
    s = jnp.where(maxc > 0, d / jnp.maximum(maxc, 1e-6) * 255.0, 0.0)
    dd = jnp.maximum(d, 1e-6)
    h = jnp.where(
        maxc == r, (g - b) / dd % 6.0,
        jnp.where(maxc == g, (b - r) / dd + 2.0, (r - g) / dd + 4.0))
    h = h * 30.0  # 0..180

    h = (h + jnp.round(gains[0])) % 180.0
    s = jnp.clip(s + jnp.round(gains[1]), 0, 255)
    v = jnp.clip(v + jnp.round(gains[2]), 0, 255)

    # branch-free HSV->RGB: f(n) = v - v*(s/255)*clip(min(k, 4-k), 0, 1),
    # k = (n + h/30) mod 6 — equal to the sextant select chain, VPU-only
    sv = v * (s / 255.0)

    def chan(n):
        k = jnp.mod(n + h / 30.0, 6.0)
        return v - sv * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack(
        [chan(5.0), chan(3.0), chan(1.0)], axis=-1).astype(in_dtype)


def _pack_labels(boxes_cls, keep, max_labels: int):
    """(cls, cx, cy, w, h) rows, kept rows compacted front, zero-padded."""
    xyxy = boxes_cls[:, :4]
    cxcywh = jnp.stack([
        (xyxy[:, 0] + xyxy[:, 2]) / 2, (xyxy[:, 1] + xyxy[:, 3]) / 2,
        xyxy[:, 2] - xyxy[:, 0], xyxy[:, 3] - xyxy[:, 1],
    ], axis=1)
    rows = jnp.concatenate([boxes_cls[:, 4:5], cxcywh], axis=1)
    rows = jnp.where(keep[:, None], rows, 0.0)
    order = jnp.argsort(~keep, stable=True)
    rows = rows[order]
    n = rows.shape[0]
    if n >= max_labels:
        return rows[:max_labels]
    return jnp.pad(rows, ((0, max_labels - n), (0, 0)))


# ---------------------------------------------------------------------------
# the batch op
# ---------------------------------------------------------------------------

def _mixup_labels(p_lab, p_valid, r, do_flip, x_off, y_off, wj, hj,
                  out_size):
    """Partner label transform (reference `mosaicdetection.py:181-195`):
    scale by r, clip to the jittered canvas, flip within its width,
    subtract the crop offsets, clip to the target."""
    oh, ow = out_size
    x1 = jnp.clip(p_lab[:, 0] * r, 0, wj)
    y1 = jnp.clip(p_lab[:, 1] * r, 0, hj)
    x2 = jnp.clip(p_lab[:, 2] * r, 0, wj)
    y2 = jnp.clip(p_lab[:, 3] * r, 0, hj)
    fx1, fx2 = wj - x2, wj - x1
    x1 = jnp.where(do_flip, fx1, x1)
    x2 = jnp.where(do_flip, fx2, x2)
    nb = jnp.stack([
        jnp.clip(x1 - x_off, 0, ow), jnp.clip(y1 - y_off, 0, oh),
        jnp.clip(x2 - x_off, 0, ow), jnp.clip(y2 - y_off, 0, oh),
    ], axis=1)
    keep = p_valid & ((nb[:, 2] - nb[:, 0]) > 1) & ((nb[:, 3] - nb[:, 1]) > 1)
    return jnp.concatenate([nb, p_lab[:, 4:5]], axis=1), keep


@partial(jax.jit, static_argnames=("out_size", "max_labels", "degrees",
                                   "translate", "shear", "enable_mixup",
                                   "flip_prob", "hsv_prob", "mosaic_prob",
                                   "mixup_prob", "image_dtype"))
def device_augment_batch(
    tiles,          # (B, 5, T, T, 3) uint8: 4 mosaic tiles + mixup partner
    tile_hw,        # (B, 5, 2) float32 true (h, w)
    labels,         # (B, 5, L, 5) float32 xyxy+cls, zero rows = padding
    key,            # jax PRNG key
    out_size: Tuple[int, int] = (640, 640),
    max_labels: int = 120,
    degrees: float = 10.0,
    translate: float = 0.1,
    scales: Tuple[float, float] = (0.1, 2.0),
    mixup_scale: Tuple[float, float] = (0.5, 1.5),
    shear: float = 2.0,
    enable_mixup: bool = True,
    flip_prob: float = 0.5,
    hsv_prob: float = 1.0,
    mosaic_prob: float = 1.0,
    mixup_prob: float = 1.0,
    image_dtype=jnp.float32,
):
    """Full train-time augmentation for a batch, on device.

    Returns (images (B, S, S, 3) `image_dtype` pixel-scale, labels
    (B, max_labels, 5) f32 rows (cls, cx, cy, w, h)). Pipeline per sample, exactly mirroring
    MosaicDetection.__getitem__: with prob mosaic_prob, mosaic(4 tiles) ->
    random affine -> [mixup with the partner tile, prob mixup_prob];
    otherwise the plain letterboxed sample; then HSV -> flip -> pack.

    The probabilities are STATIC (recompile per distinct value — they are
    config constants): at the reference defaults mosaic_prob=hsv_prob=1.0
    the engine skips the letterboxed plain-image path and the HSV select
    entirely at trace time (uniform() < 1.0 is always true, but XLA
    cannot prove it), saving ~4 ms of full-image passes per b64 batch.

    `image_dtype` (static) sets the dtype of the returned images AND the
    inter-stage image buffers (warp output, MixUp blend, HSV in/out).
    The fused train step passes its bf16 compute dtype — pixels land in
    bf16 there regardless, so running the stage boundaries in bf16 only
    moves the rounding point (<= 1-2 pixel LSB) while halving the
    inter-stage HBM traffic. HSV math itself always runs in f32
    (in-register, fused into the pointwise chain).
    """
    from yolox_tpu.ops.pallas_warp import mixup_resample, mosaic_affine_warp

    b = tiles.shape[0]
    oh, ow = out_size
    n_rows = 5 * labels.shape[2]
    keys = jax.random.split(key, b)

    # ---- per-sample random draws (vmapped scalar math) ----
    def draws(k):
        ks = jax.random.split(k, 10)
        yc = jnp.floor(jax.random.uniform(
            ks[0], (), minval=0.5 * oh, maxval=1.5 * oh))
        xc = jnp.floor(jax.random.uniform(
            ks[1], (), minval=0.5 * ow, maxval=1.5 * ow))
        m, _ = random_affine_matrix(
            ks[2], out_size, degrees, translate, scales, shear)
        u_mix = jax.random.uniform(ks[3], ())
        jf = jax.random.uniform(ks[4], (), minval=mixup_scale[0],
                                maxval=mixup_scale[1])
        mixflip = jax.random.uniform(ks[5], ()) > 0.5
        y_off = jnp.floor(jax.random.uniform(ks[6], ())
                          * jnp.maximum(oh * jf - oh, 0.0))
        x_off = jnp.floor(jax.random.uniform(ks[7], ())
                          * jnp.maximum(ow * jf - ow, 0.0))
        do_mosaic = jax.random.uniform(ks[8], ()) < mosaic_prob
        sub = jax.random.split(ks[9], 3)
        do_hsv = jax.random.uniform(sub[0], ()) < hsv_prob
        do_flip = jax.random.uniform(sub[1], ()) < flip_prob
        return (yc, xc, m, u_mix, jf, mixflip, y_off, x_off, do_mosaic,
                do_hsv, sub[2], do_flip)

    (yc, xc, m, u_mix, jf, mixflip, y_off, x_off, do_mosaic, do_hsv,
     hsv_keys, do_flip) = jax.vmap(draws)(keys)

    # ---- labels (vmapped closed-form affine math) ----
    def label_pass(hw5, lab5, mb, xcb, ycb, jfb, mixflipb, xob, yob,
                   u_mixb):
        valid = jnp.sum(jnp.abs(lab5), axis=-1) > 0      # (5, L)
        sp = jnp.concatenate(
            [jnp.ones((4, 1)), _mosaic_geometry(
                hw5[:4].astype(jnp.float32), xcb, ycb,
                float(oh), float(ow))[1]], axis=1)
        boxes_m, keep_m = transform_labels(
            lab5[:4], valid[:4], sp, mb, out_size)       # (4L, 5)

        do_mix = jnp.bool_(False)
        if enable_mixup:
            # gate on ANY mosaic annotation, incl. boxes the size filter
            # later drops — the reference's `len(mosaic_labels) != 0` counts
            # clipped/degenerate rows too (mosaicdetection.py:131-135), so
            # gating on the filtered keep mask skipped mixup on ~13% of
            # samples (measured) and shifted the pixel distribution
            do_mix = (u_mixb < mixup_prob) & jnp.any(valid[:4])
            r0 = jnp.minimum(oh / hw5[4, 0], ow / hw5[4, 1])
            r = r0 * jfb
            boxes_p, keep_p = _mixup_labels(
                lab5[4], valid[4], r, mixflipb, xob, yob,
                ow * jfb, oh * jfb, out_size)
            boxes_m = jnp.concatenate([boxes_m, boxes_p], axis=0)
            keep_m = jnp.concatenate([keep_m, keep_p & do_mix], axis=0)
        boxes_m = _pad_rows(boxes_m, n_rows)
        keep_m = _pad_mask(keep_m, n_rows)

        wn = lab5[0, :, 2] - lab5[0, :, 0]
        hn = lab5[0, :, 3] - lab5[0, :, 1]
        keep_n = _pad_mask(valid[0] & (jnp.minimum(wn, hn) > 1), n_rows)
        boxes_n = _pad_rows(lab5[0], n_rows)
        return boxes_m, keep_m, boxes_n, keep_n, do_mix

    boxes_m, keep_m, boxes_n, keep_n, do_mix = jax.vmap(label_pass)(
        tile_hw, labels, m, xc, yc, jf, mixflip, x_off, y_off, u_mix)

    # ---- images, batched (MXU scale pass + Pallas shear passes) ----
    # The TrainTransform flip (`img[:, ::-1]` in the reference tail) is
    # FOLDED into each image producer's sample coordinates instead of
    # applied as a full-image reverse pass at the end: flip commutes
    # with HSV (pointwise) and with the 0.5/0.5 MixUp blend, and a
    # bilinear warp of mirrored coordinates equals the mirror of the
    # warp. Mosaic: compose x' = (ow-1) - x into the affine matrix.
    ow_f = jnp.float32(ow)
    m_flip = jnp.concatenate(
        [
            jnp.stack([-m[:, 0, 0], -m[:, 0, 1],
                       (ow_f - 1.0) - m[:, 0, 2]], axis=1)[:, None, :],
            m[:, 1:2, :],
        ],
        axis=1,
    )
    m_used = jnp.where(do_flip[:, None, None], m_flip, m)
    from yolox_tpu.ops.pallas_warp import margin_for
    img_m = mosaic_affine_warp(
        tiles[:, :4], tile_hw[:, :4], m_used, xc, yc, out_size,
        margin=margin_for(out_size[0], degrees, shear),
        out_dtype=image_dtype)
    if enable_mixup:
        r0 = jnp.minimum(oh / tile_hw[:, 4, 0], ow / tile_hw[:, 4, 1])
        part = jax.vmap(
            lambda t, hw, rr, fl, xo, yo, ofl: mixup_resample(
                t, hw, rr, fl, xo, yo, out_size, out_flip=ofl,
                out_dtype=image_dtype)
        )(tiles[:, 4], tile_hw[:, 4], r0 * jf, mixflip, x_off, y_off,
          do_flip)
        img_m = jnp.where(do_mix[:, None, None, None],
                          0.5 * img_m + 0.5 * part, img_m)

    if mosaic_prob >= 1.0:
        # static: every sample takes the mosaic path — the plain
        # letterboxed image (reverse + two full-image selects) is dead
        img = img_m
        boxes, keep = boxes_m, keep_m
    else:
        # plain path: letterboxed tile 0, mirrored per sample when
        # flipped (uint8 static reverse + select — cheaper than
        # reversing the f32 blended batch)
        ys_g, xs_g = jnp.mgrid[0:oh, 0:ow].astype(jnp.float32)
        t0 = tiles[:, 0, :oh, :ow]
        src = jnp.where(do_flip[:, None, None, None], t0[:, :, ::-1], t0)
        xs_eff = jnp.where(do_flip[:, None, None],
                           (ow_f - 1.0) - xs_g[None], xs_g[None])
        in0 = ((ys_g[None] < tile_hw[:, 0, 0, None, None])
               & (xs_eff < tile_hw[:, 0, 1, None, None]))
        img_n = jnp.where(in0[..., None], src.astype(image_dtype),
                          jnp.asarray(PAD, image_dtype))

        img = jnp.where(do_mosaic[:, None, None, None], img_m, img_n)
        boxes = jnp.where(do_mosaic[:, None, None], boxes_m, boxes_n)
        keep = jnp.where(do_mosaic[:, None], keep_m, keep_n)

    # ---- shared TrainTransform tail: HSV -> pack (flip already folded
    # into the image producers; labels mirror below) ----
    hsv = jax.vmap(hsv_jitter)(img, hsv_keys)
    if hsv_prob >= 1.0:
        img = hsv
    else:
        img = jnp.where(do_hsv[:, None, None, None], hsv, img)
    fboxes = jnp.stack([
        ow - boxes[..., 2], boxes[..., 1], ow - boxes[..., 0],
        boxes[..., 3],
    ], axis=-1)
    boxes = jnp.where(do_flip[:, None, None],
                      jnp.concatenate([fboxes, boxes[..., 4:5]], -1), boxes)

    packed = jax.vmap(lambda bx, kp: _pack_labels(bx, kp, max_labels))(
        boxes, keep)
    return img, packed


def _pad_rows(rows, n):
    if rows.shape[0] >= n:
        return rows[:n]
    return jnp.pad(rows, ((0, n - rows.shape[0]), (0, 0)))


def _pad_mask(mask, n):
    if mask.shape[0] >= n:
        return mask[:n]
    return jnp.pad(mask, (0, n - mask.shape[0]))
