"""TPU-native affine warp engine for device-side augmentation.

Arbitrary per-pixel gathers serialize on TPU (~ns/element), so the mosaic
+ affine warp is decomposed into TPU-friendly passes instead
(`yolox_tpu/data/device_augment.py` is the consumer):

  output(x) = canvas(Minv x + t),  Minv = D · L · U   (scale leftmost)

  1. **scale pass (MXU)**: h1 = resample of the virtual mosaic canvas at
     scale/translate D,t — computed canvas-free as a sum of banded
     interpolation matmuls over the 4 tiles (`Ay_t @ tile_t @ Ax_t^T`),
     with the 114 border entering through the interpolation-weight
     deficit `114 * (1 - coverage)`. The 2x canvas is never materialized.
  2. **y-shear pass (Pallas)**: h2[r, s] = h1[r + cL*(s - m), s] — per-
     column vertical shift, run as the x-shear kernel on the transpose.
  3. **x-shear pass (Pallas)**: out[i, j] = h2[i, j + uU*i + m] — per-row
     horizontal fractional shift, implemented with `tpu.dynamic_rotate`
     (pltpu.roll) + two-tap lerp; lane slices stay 128-aligned.

Exactness: the banded matmul resample is bitwise bilinear; the 3-pass
composition differs from single-pass bilinear only in interpolation
order (slightly softer on high-frequency content — the usual multi-pass
warp tradeoff; labels use exact closed-form affine math and are
unaffected). The decomposition D·L·U requires |rotation+shear| < 90°,
which the augmentation ranges guarantee.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 114.0


def margin_for_slope(s: int, slope: float) -> int:
    """Shear slack for a given |slope| bound: the decomposed passes need
    |slope| * (S + margin) <= margin, i.e. margin >= slope*S/(1-slope),
    rounded to 64 for lane-friendly working widths."""
    if slope >= 0.85:
        raise ValueError(
            f"affine slope bound {slope:.2f} too large for the decomposed "
            "warp (combined rotation+shear must stay well below 45 deg)")
    need = slope * s / (1.0 - slope)
    # round to sublanes only — the caller rounds the working grid to a
    # DMA-friendly width; every extra margin pixel costs O(grid) matmul
    # FLOPs in the scale pass (640px: margin 216 vs 256 is ~2 ms/b64)
    return max(128, int(math.ceil(need / 8.0)) * 8)


def margin_for(s: int, degrees: float, shear: float) -> int:
    """Margin sized for actual augmentation ranges. The decomposed shear
    slopes |cl|, |uu| are bounded by tan(degrees + 2*shear) (rotation
    mixes into both passes; each shear axis contributes once to its own
    pass and once through the LDU cross term). Floored at the legacy
    slope-0.22 envelope so default configs keep their proven margins."""
    slope = math.tan(math.radians(abs(degrees) + 2.0 * abs(shear)))
    return margin_for_slope(s, max(slope, 0.22))


def default_margin(s: int) -> int:
    """Legacy default: slope 0.22 (~12.5 deg combined rotation+shear —
    above the config maximum degrees=10 + shear=2). 640px -> 192 (working
    grid 1024, was a fixed 256 -> 1152: 27% less pass-1/transpose work).
    Callers with non-default degrees/shear should use `margin_for`."""
    return margin_for_slope(s, 0.22)


MARGIN = 256  # legacy fixed slack (callers now default to default_margin)


def ldu_decompose(minv):
    """Minv = diag(p, q) @ [[1, 0], [cl, 1]] @ [[1, uu], [0, 1]].

    Returns (p, q, cl, uu). Valid while minv[0, 0] != 0 (rotations far
    from 90°, always true for augmentation angles)."""
    a, b = minv[0, 0], minv[0, 1]
    c, d = minv[1, 0], minv[1, 1]
    uu = b / a
    q = d - c * uu
    cl = c / q
    return a, q, cl, uu


def affine_inverse_2x3(m):
    a, b, tx = m[0]
    c, d, ty = m[1]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    return (jnp.stack([jnp.stack([ia, ib]), jnp.stack([ic, id_])]),
            jnp.stack([-(ia * tx + ib * ty), -(ic * tx + id_ * ty)]))


# ---------------------------------------------------------------------------
# pass 1: canvas-free separable resample (MXU)
# ---------------------------------------------------------------------------

def _hat(centers, coords):
    """Bilinear weights (R, Y): max(0, 1 - |center_r - coord_y|)."""
    return jnp.maximum(
        0.0, 1.0 - jnp.abs(centers[:, None] - coords[None, :]))


def scale_resample_tiles(tiles, tile_hw, offsets, xs, ys, canvas_hw,
                         border=PAD, zero_outside_canvas=False,
                         transposed_out=False, compute_dtype=jnp.float32,
                         out_dtype=jnp.float32):
    """h1[r, s, c] = canvas(xs[s], ys[r]) for a virtual canvas of size
    canvas_hw holding `tiles` pasted at integer `offsets`, border-filled
    with `border` (cv2 BORDER_CONSTANT both outside tiles and outside the
    canvas; with zero_outside_canvas, outside-canvas reads 0 instead —
    the mixup zero-pad semantics).

    tiles: (N, T, T, 3) uint8/float; tile_hw (N, 2) true sizes;
    offsets (N, 2) [ox, oy] float (integer-valued); xs (W,), ys (R,)
    float canvas sample coords. Returns (R, W, 3) f32 — or (W, R, 3)
    with transposed_out (emitted directly from the contraction, so the
    consumer's transpose costs no extra HBM pass).

    compute_dtype=bf16 runs the interpolation matmuls at the MXU's
    native rate with f32 accumulation: pixel values 0..255 are exact in
    bf16, the bilinear weights round to ~2^-9 relative, so outputs move
    by O(1) pixel LSB — fine for augmentation, not for letterbox-exact
    eval preprocessing (which uses ops/preproc.py, not this).
    """
    ch, cw = canvas_hw
    n, t = tiles.shape[0], tiles.shape[1]
    ty_idx = jnp.arange(t, dtype=jnp.float32)

    def tile_weights(hw, off):
        ycv = off[1] + ty_idx                       # (T,) canvas y coords
        xcv = off[0] + ty_idx
        in_tile_y = ty_idx < hw[0]
        in_tile_x = ty_idx < hw[1]
        ay = _hat(ys, ycv) * (in_tile_y & (ycv >= 0) & (ycv < ch))[None, :]
        ax = _hat(xs, xcv) * (in_tile_x & (xcv >= 0) & (xcv < cw))[None, :]
        return ay, ax

    ay, ax = jax.vmap(tile_weights)(tile_hw, offsets)   # (N, R/W, T)
    # Σ_t (ay_t @ tile_t) @ ax_t^T as ONE contraction over the tile-
    # stacked axis: materializing the per-tile (R, S, 3) terms and
    # summing costs ~8 GB/call of HBM traffic at batch 64 (measured);
    # concatenating the x axis across tiles makes the second einsum
    # produce h1 directly.
    out_spec = "src" if transposed_out else "rsc"
    tmp = jnp.einsum("try,tyxc->rtxc",
                     ay.astype(compute_dtype), tiles.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    h1 = jnp.einsum(f"rtxc,tsx->{out_spec}",
                    tmp.astype(compute_dtype), ax.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
    # coverage: Σ_t outer(ay_t·1, ax_t·1) = (N,R)ᵀ-stack contraction
    # (f32: the deficit term multiplies the border value)
    cov = jnp.clip(
        jnp.einsum("tr,ts->rs" if not transposed_out else "tr,ts->sr",
                   ay.sum(2), ax.sum(2)), 0.0, 1.0)

    if zero_outside_canvas:
        # border only within the canvas; zero beyond it
        covy = jnp.clip(jnp.minimum(ys + 1.0, ch - ys), 0.0, 1.0)
        covx = jnp.clip(jnp.minimum(xs + 1.0, cw - xs), 0.0, 1.0)
        cov_canvas = (jnp.outer(covx, covy) if transposed_out
                      else jnp.outer(covy, covx))
        bterm = border * jnp.maximum(cov_canvas - cov, 0.0)
    else:
        bterm = border * (1.0 - cov)
    # the casts ride the border-add fusion: with out_dtype=bf16 the O(R*W)
    # border term and every downstream pass (layout copies, shear windows)
    # move half the bytes (cast-then-add vs add-then-cast: <= 1 LSB)
    return h1.astype(out_dtype) + bterm.astype(out_dtype)[..., None]


# ---------------------------------------------------------------------------
# passes 2+3: fractional shear via Pallas dynamic lane rotate
# ---------------------------------------------------------------------------

def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


_GROUP = 8      # rows per kernel iteration = the VPU sublane count
_MAX_DK = 3     # max integer-shift spread within a group (slope<=0.23 * 7
                # rows -> <=2; one extra for safety)


def _shear_kernel(shift_ref, in_ref, out_ref, *, out_w: int, win: int,
                  k_max: int, px: int, wl: int):
    """Per-row fractional x-shift over channel-interleaved rows,
    processed in groups of 8 rows (full sublane occupancy — the one-row-
    per-iteration formulation used 1/8 of every vector op and was ~3x
    slower).

    Integer pixel shifts split three ways: a group-shared 128-aligned
    dynamic lane slice (Mosaic requires lane slices to be 128-aligned),
    a group-shared sub-128 `tpu.dynamic_rotate` (rotates all 8 sublanes
    by the group-min shift), and a per-row residual d in [0, _MAX_DK]
    (shifts vary by |slope| <= ~0.23 pixel/row) resolved by selecting
    among cheap STATIC rolls of the group tile. The rotate operates on a
    power-of-two-wide window (dynamic_rotate silently corrupts data for
    non-power-of-two lane counts)."""
    rot_w = _next_pow2(win)

    def body(g, _):
        s = shift_ref[0, pl.ds(g * _GROUP, _GROUP), :]       # (8, 1) f32
        k = jnp.clip(jnp.floor(s).astype(jnp.int32), 0, k_max)
        f = s - k.astype(jnp.float32)                        # (8, 1)
        k_min = jnp.min(k)
        d = jnp.clip(k - k_min, 0, _MAX_DK)                  # (8, 1)
        lane_min = k_min * px
        # clamp the window start so [base, base+win) stays in bounds —
        # the roll absorbs the excess (lo < win <= rot_w always, see
        # shear_x) — instead of padding the input by an extra HBM pass
        base = pl.multiple_of(
            jnp.minimum((lane_min // 128) * 128, wl - win), 128)
        lo = lane_min - base                                 # [0, win)
        window = in_ref[0, pl.ds(g * _GROUP, _GROUP), pl.ds(base, win)]
        # bf16 inputs halve the HBM->VMEM block traffic, but
        # tpu.dynamic_rotate only handles 32-bit data — convert the
        # in-register window to f32 for the rolls
        window = window.astype(jnp.float32)
        if rot_w != win:
            window = jnp.concatenate(
                [window,
                 jnp.zeros((_GROUP, rot_w - win), window.dtype)], axis=1)
        r0 = pltpu.roll(window, shift=-lo, axis=1)           # (8, rot_w)
        # static rolls r0 shifted by d*px lanes, d = 0.._MAX_DK+1 (the
        # +1 covers the second lerp tap)
        rolled = [r0[:, :out_w * px]]
        for dd in range(1, _MAX_DK + 2):
            # left-rotate by dd*px as the modular non-negative shift
            rolled.append(pltpu.roll(
                r0, shift=rot_w - dd * px, axis=1)[:, :out_w * px])
        za = rolled[0]
        zb = rolled[1]
        for dd in range(1, _MAX_DK + 1):
            sel = d == dd                                    # (8, 1)
            za = jnp.where(sel, rolled[dd], za)
            zb = jnp.where(sel, rolled[dd + 1], zb)
        # lerp in f32 regardless of the (possibly bf16) window dtype
        out_ref[0, pl.ds(g * _GROUP, _GROUP), :] = (
            za.astype(jnp.float32) * (1.0 - f)
            + zb.astype(jnp.float32) * f).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, out_ref.shape[1] // _GROUP, body, 0)


def shear_x(img, shifts, out_w: int, px: int = 1):
    """out[b, i, (j, c)] = img[b, i, (j + shifts[b, i], c)], bilinear.

    img: (B, H, W*px) f32 with px channel-interleaved lanes per pixel
    (x-major, channel-minor); shifts (B, H) f32 pixel shifts in
    [0, W - out_w - 2]. Returns (B, H, out_w*px). The input is padded so
    the kernel's 128-aligned window never reads out of bounds.

    Contract (narrower than the scan reference): within every group of
    8 consecutive rows, integer shifts may span at most _MAX_DK pixels —
    i.e. |d shift / d row| <= _MAX_DK/7 ≈ 0.43. Affine shear shifts
    (slope = the decomposed cl/uu, <= ~0.23 for the supported transform
    range) always satisfy this; rows beyond the spread clamp to the
    group envelope.
    """
    b, h, wl = img.shape
    w = wl // px
    win = ((out_w * px + 128 + (_MAX_DK + 1) * px + 127) // 128) * 128
    k_max = max(w - out_w - 2, 0)
    # the kernel clamps its window start into [0, wl - win] (the roll
    # absorbs the residual), so the input only needs lane alignment and
    # at least `win` lanes — no full shift-range padding pass
    required = max(win, ((wl + 127) // 128) * 128)
    if wl < required:
        img = jnp.pad(img, ((0, 0), (0, 0), (0, required - wl)))
        wl = required
    # block over rows so VMEM holds (rows_blk, wl)+(rows_blk, out) with
    # double buffering — full-height blocks overflow the ~16MB budget
    rows_blk = h
    for cand in (128, 64, 32, 16, 8):
        if h % cand == 0:
            rows_blk = cand
            break
    assert rows_blk % _GROUP == 0, (
        f"shear_x needs row count divisible by {_GROUP}, got {h}")
    kernel = partial(_shear_kernel, out_w=out_w, win=win, k_max=k_max,
                     px=px, wl=wl)
    return pl.pallas_call(
        kernel,
        grid=(b, h // rows_blk),
        in_specs=[
            pl.BlockSpec((1, rows_blk, 1), lambda bi, hi: (bi, hi, 0)),
            pl.BlockSpec((1, rows_blk, wl), lambda bi, hi: (bi, hi, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows_blk, out_w * px),
                               lambda bi, hi: (bi, hi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, out_w * px), img.dtype),
    )(shifts[..., None], img)


def shear_x_reference(img, shifts, out_w: int, px: int = 1):
    """Pure-XLA fallback of shear_x (scan of dynamic slices) for backends
    without Pallas TPU support (CPU tests)."""
    w = img.shape[2] // px
    k_hi_cap = max(w - out_w - 2, 0)

    def one(im, s):  # im (H, W*px), s (H,)
        k = jnp.clip(jnp.floor(s).astype(jnp.int32), 0, k_hi_cap)
        f = s - k.astype(jnp.float32)

        def body(carry, args):
            row, ki, fi = args                      # row (W*px,)
            a = jax.lax.dynamic_slice(row, (ki * px,), (out_w * px,))
            bb = jax.lax.dynamic_slice(row, (ki * px + px,), (out_w * px,))
            return carry, a * (1 - fi) + bb * fi

        _, rows = jax.lax.scan(body, 0, (im, k, f))
        return rows                                  # (H, out_w*px)

    return jax.vmap(one)(img, shifts)


def _use_pallas():
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# full warp: mosaic tiles + affine -> output
# ---------------------------------------------------------------------------

def mosaic_affine_warp(tiles, tile_hw, m, xc, yc, out_size: Tuple[int, int],
                       margin: int = None, out_dtype=jnp.float32):
    """Batched fused mosaic + affine warp, TPU-native.

    tiles (B, 4, T, T, 3) uint8; tile_hw (B, 4, 2); m (B, 2, 3) affine
    (canvas -> output, cv2 convention); xc/yc (B,) mosaic centers.
    Returns (B, S, S, 3) `out_dtype`. out_size must be square (S, S).

    Supported transform range: |shear slope| of the decomposed passes
    must satisfy |slope| * (S + margin) <= margin — `default_margin`
    sizes the slack for rotation+shear up to ~12.5 deg, covering the
    augmentation ranges (degrees<=10, shear<=2). Beyond that, shifts
    clamp at the working-grid edge and the output distorts near borders;
    pass a larger explicit margin for exotic configs.
    """
    s = out_size[0]
    assert out_size[0] == out_size[1], "mosaic output is square"
    if margin is None:
        margin = default_margin(s)
    wr = s + 2 * margin
    # round WR up to 64 rows: enough for an efficient shear row-block
    # (wl lane padding happens inside shear_x) without inflating the
    # O(WR^2) scale matmul to full 128-multiples
    wr = ((wr + 63) // 64) * 64
    margin_x = margin
    b = tiles.shape[0]

    def geom(hw, xcb, ycb):
        h = hw[:, 0]
        w = hw[:, 1]
        ox = jnp.stack([xcb - w[0], xcb + 0 * w[1], xcb - w[2], xcb + 0 * w[3]])
        oy = jnp.stack([ycb - h[0], ycb - h[1], ycb + 0 * h[2], ycb + 0 * h[3]])
        return jnp.stack([ox, oy], axis=1)          # (4, 2) [ox, oy]

    def prep(mb, xcb, ycb, hw):
        minv, tinv = affine_inverse_2x3(mb)
        p, q, cl, uu = ldu_decompose(minv)
        # scale-pass sample coords over the working grid
        grid = jnp.arange(wr, dtype=jnp.float32) - margin_x
        xs = p * grid + tinv[0]
        ys = q * grid + tinv[1]
        offs = geom(hw.astype(jnp.float32), xcb, ycb)
        return xs, ys, cl, uu, offs

    xs, ys, cl, uu, offs = jax.vmap(prep)(m, xc, yc, tile_hw)

    # pass 1: canvas-free scale resample, emitted TRANSPOSED (B, WR_x,
    # WR_y, 3) straight from the contraction — pass 2 consumes the
    # x-major layout, so no separate (B, WR, WR, 3) transpose pass.
    # bf16 interpolation matmuls on TPU (MXU-native; see
    # scale_resample_tiles), f32 elsewhere to keep CPU tests exact.
    cdt = jnp.bfloat16 if _use_pallas() else jnp.float32
    h1t4 = jax.vmap(
        lambda t4, hw4, o4, x, y: scale_resample_tiles(
            t4, hw4.astype(jnp.float32), o4, x, y, (2 * s, 2 * s),
            transposed_out=True, compute_dtype=cdt, out_dtype=cdt)
    )(tiles, tile_hw, offs, xs, ys)

    # pass 2 (y-shear): h2[r, s'] = h1[r + cl*(s' - margin), s'] for
    # r in [0, S) — run as x-shear over channel-interleaved lanes (one
    # dynamic rotate covers all 3 channels; 3x fewer kernel iterations)
    h1t = h1t4.reshape(b, wr, wr * 3)
    col = jnp.arange(wr, dtype=jnp.float32)
    shifts_y = cl[:, None] * (col - margin_x) + margin_x  # (B, WR)
    fn = shear_x if _use_pallas() else shear_x_reference
    h2 = fn(h1t, shifts_y, s, px=3)                 # (B, WR_s, S*3)

    # pass 3 (x-shear): out[i, j] = h2[i, j + uu*i + margin]
    h2t = jnp.transpose(
        h2.reshape(b, wr, s, 3), (0, 2, 1, 3)).reshape(b, s, wr * 3)
    row = jnp.arange(s, dtype=jnp.float32)
    shifts_x = uu[:, None] * row[None, :] + margin_x      # (B, S)
    out = fn(h2t, shifts_x, s, px=3)                # (B, S, S*3)
    return out.reshape(b, s, s, 3).astype(out_dtype)


def mixup_resample(p_tile, p_hw, r, do_flip, x_off, y_off,
                   out_size: Tuple[int, int], out_flip=False,
                   out_dtype=jnp.float32):
    """Partner-image resample for MixUp (reference geometry): letterbox to
    the input size, scale the whole canvas by jit factor (total content
    scale `r`), optional h-flip, zero-pad, crop at (x_off, y_off).
    Single separable pass (no rotation). Returns (S, S, 3) f32.

    out_flip additionally mirrors the OUTPUT x axis (the TrainTransform
    final flip folded into the sample coordinates — output column j
    reads cropped column ow-1-j)."""
    oh, ow = out_size
    # jittered canvas size: (oh * jf, ow * jf); r = r0 * jf where r0 is
    # the letterbox scale — recover jf from r and r0
    r0 = jnp.minimum(oh / p_hw[0], ow / p_hw[1])
    jf = r / r0
    hj, wj = oh * jf, ow * jf

    ys = (jnp.arange(oh, dtype=jnp.float32) + y_off) / r
    j = jnp.arange(ow, dtype=jnp.float32)
    j = jnp.where(out_flip, (ow - 1.0) - j, j)
    xs_canvas = j + x_off
    # un-flip in jittered-canvas coords (image flip reads wj-1-x), then
    # scale down to tile coords
    xs = jnp.where(do_flip, ((wj - 1.0) - xs_canvas), xs_canvas) / r

    h1 = scale_resample_tiles(
        p_tile[None], p_hw[None].astype(jnp.float32),
        jnp.zeros((1, 2), jnp.float32), xs, ys,
        (hj, wj), border=PAD, zero_outside_canvas=True,
        compute_dtype=jnp.bfloat16 if _use_pallas() else jnp.float32,
        out_dtype=out_dtype)
    return h1
