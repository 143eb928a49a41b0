"""Transpose-free space-to-depth stem: the MXU formulation of Focus+dark2.

XLA lowers convolutions whose input feature count is tiny (the 3-channel
Focus stem, reference `yolox/models/network_blocks.py:186-208`) as VPU
spatial-blocked fusions at ~0.6% MFU plus boundary relayout copies —
measured as 65% of yolox-s batch-1 device time and ~50us/img even at
batch 64 (docs/serving_performance.md, round-4 profile). The classic fix
is the space-to-depth-conv transform; done naively on device it just
moves the pathology into the relayout (the transpose of a 3-lane tensor).

This module is the transpose-free version (scripts/stem_s2d_study.py):

1. `x.reshape(B, H, W/4, 12)` — the horizontal 4x fold into channels is
   a pure row-major reshape: FREE (no transpose, no gather).
2. conv A: an 8x3 kernel at row-stride 4 absorbs the VERTICAL 4x fold —
   output position (p, q) holds the stem's full 2x2 output block
   (channel = bi*C + o, bi indexing the reference Focus quadrant order
   (0,0),(1,0),(0,1),(1,1) of the block position (a, b)). K = 8*3*12 =
   288 (2.67x the logical 108 taps; the rest are structural zeros) but
   the contraction is MXU-shaped where the baseline ran the VPU.
3. Stem BN+act apply per-channel with 4x-tiled parameters (slot-major
   layout matches `jnp.tile`), bit-identical per logical channel.
4. conv B: dark2's first 3x3 stride-2 conv becomes a 2x2 stride-1 conv
   over the blocked channels, pad ((1,0),(1,0)) — the depth-to-space
   never materializes. Output layout is exactly the plain path's
   (B, H/4, W/4, 2C), so everything downstream is untouched.

Both folds are exact tap re-indexings (the only numeric delta is conv
reduction reassociation; verified to 4e-7 relative in f32). Measured on
v5e at 640px b1: stem+dark2conv1 region 884us -> 244us (3.6x).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")

# Reference Focus quadrant order (TL, BL, TR, BR) = (dy, dx); also used
# for the (a, b) output-block order so conv B's consumer mapping is fixed.
QUAD = ((0, 0), (1, 0), (0, 1), (1, 1))


def _stem_fold_index():
    """Static (numpy) tap map for fold_stem_kernel: for each conv-A slot
    (r, dq, s, bi) the source Focus tap (u, v, gi) — or masked zero.

    The map is injective per block index bi: rowoff = 2(a+u-1)+dy fixes
    (u, dy) by parity, coloff = 2(b+v-1)+dx fixes (v, dx), and (dq, s)
    <-> coloff is a bijection, so every slot has at most one source.
    """
    U = np.zeros((8, 3, 4, 4), np.int32)
    V = np.zeros((8, 3, 4, 4), np.int32)
    G = np.zeros((8, 3, 4, 4), np.int32)
    M = np.zeros((8, 3, 4, 4), np.float32)
    for bi, (a, b) in enumerate(QUAD):
        for u in range(3):
            for v in range(3):
                for gi, (dy, dx) in enumerate(QUAD):
                    rowoff = 2 * (a + u - 1) + dy          # in [-2, 5]
                    coloff = 2 * (b + v - 1) + dx          # in [-2, 5]
                    dq, s = coloff // 4, coloff % 4
                    U[rowoff + 2, dq + 1, s, bi] = u
                    V[rowoff + 2, dq + 1, s, bi] = v
                    G[rowoff + 2, dq + 1, s, bi] = gi
                    M[rowoff + 2, dq + 1, s, bi] = 1.0
    return U, V, G, M


_STEM_IDX = _stem_fold_index()


def fold_stem_kernel(w1):
    """(3, 3, 12, C) Focus conv kernel -> (8, 3, 12, 4C) conv-A kernel.

    Input channel s*3+c of the reshaped (B, H, W/4, 12) image is raw
    pixel column offset s in [0,4); the kernel row covers raw rows
    4p-2..4p+5 at stride 4. For each output block position (a, b) and
    original tap (u, v, quadrant g=(dy, dx)): the raw pixel read is
    row 4p + 2(a+u-1)+dy, col 4q + 2(b+v-1)+dx.

    Implemented as ONE static gather (+ mask) so the fold costs a few
    kB of data movement inside the serving graph, not a chain of
    dynamic-update-slices.
    """
    c = w1.shape[3]
    U, V, G, M = _STEM_IDX
    # (u, v, 12, C) -> (u, v, gi, cc, C); gather -> (8, 3, 4, 4, cc, C)
    w1r = w1.reshape(3, 3, 4, 3, c)
    wa = w1r[U, V, G] * jnp.asarray(M, w1.dtype)[..., None, None]
    # (r, dq, s, bi, cc, C) -> (r, dq, s, cc, bi, C) -> (8, 3, 12, 4C)
    return wa.transpose(0, 1, 2, 4, 3, 5).reshape(8, 3, 12, 4 * c)


def _next_fold_index():
    """Static tap map for fold_next_kernel: slot (dp, dq, bi) -> (u, v)."""
    U = np.zeros((2, 2, 4), np.int32)
    V = np.zeros((2, 2, 4), np.int32)
    M = np.zeros((2, 2, 4), np.float32)
    for u in range(3):
        dp, a = (u - 1) // 2, (u - 1) % 2
        for v in range(3):
            dq, b = (v - 1) // 2, (v - 1) % 2
            bi = QUAD.index((a, b))
            U[dp + 1, dq + 1, bi] = u
            V[dp + 1, dq + 1, bi] = v
            M[dp + 1, dq + 1, bi] = 1.0
    return U, V, M


_NEXT_IDX = _next_fold_index()


def fold_next_kernel(wd):
    """(3, 3, C, C2) stride-2 conv kernel -> (2, 2, 4C, C2) on blocks.

    Consumes conv A's blocked channels (bi*C + o): the original tap at
    stem-grid row 2m+u-1 lives in block row m + (u-2)//2... precisely,
    t = u-1 -> (dp, a) = (t//2, t%2), a 2-tap window with pad (1, 0).
    Single static gather, like `fold_stem_kernel`.
    """
    c, c2 = wd.shape[2], wd.shape[3]
    U, V, M = _NEXT_IDX
    wb = wd[U, V] * jnp.asarray(M, wd.dtype)[..., None, None]
    return wb.reshape(2, 2, 4 * c, c2)


def tile4(bn_params):
    """BN parameter dict -> the same dict tiled 4x (slot-major blocks)."""
    return {k: (jnp.tile(v, 4) if getattr(v, "ndim", 0) == 1 else v)
            for k, v in bn_params.items()}


def blocked_batch_norm_train(p, a, ctx, path):
    """Train-mode BN on the blocked stem activation (slot-major 4C
    lanes): batch statistics pool the 4 block slots back to the C
    logical channels. Numerically the plain stem BN: the blocked tensor
    holds exactly the same value multiset per logical channel (the
    blocked H/4 x W/4 x 4 slots are the plain H/2 x W/2 positions), so
    mean-of-slot-means is the overall mean and the pooled variance is
    the overall variance. Running-stat updates are logical (C,), same
    collector key as the plain path (`models/blocks.py:batch_norm`).
    """
    from yolox_tpu.models.blocks import BN_EPS, BN_MOMENTUM

    c = p["weight"].shape[0]
    sdt = jnp.promote_types(a.dtype, jnp.float32)
    mean_f = jnp.mean(a, axis=(0, 1, 2), dtype=sdt)          # (4C,)
    mean = jnp.mean(mean_f.reshape(4, c), axis=0)            # (C,)
    diff = a.astype(sdt) - jnp.tile(mean, 4)
    var_f = jnp.mean(diff * diff, axis=(0, 1, 2))
    var = jnp.mean(var_f.reshape(4, c), axis=0)
    if ctx.collector is not None:
        n = a.shape[0] * a.shape[1] * a.shape[2] * 4
        unbiased = var * (n / max(n - 1, 1))
        m = BN_MOMENTUM
        ctx.collector.put(
            path,
            (1 - m) * p["running_mean"] + m * mean,
            (1 - m) * p["running_var"] + m * unbiased,
            p["num_batches_tracked"] + 1)
    inv = lax.rsqrt(var.astype(sdt) + BN_EPS)
    scale = jnp.tile((p["weight"] * inv).astype(a.dtype), 4)
    bias = jnp.tile(
        (p["bias"] - mean * p["weight"] * inv).astype(a.dtype), 4)
    return a * scale + bias


def stem_conv_blocked(w1, x):
    """Raw image (B, H, W, 3) -> pre-BN blocked stem (B, H/4, W/4, 4C)."""
    b, h, w, _ = x.shape
    y = x.reshape(b, h, w // 4, 12)
    wa = fold_stem_kernel(w1)
    return lax.conv_general_dilated(
        y, wa.astype(x.dtype), (4, 1), ((2, 2), (1, 1)),
        dimension_numbers=_DN)


def next_conv_blocked(wd, a):
    """Blocked stem activation (B, H/4, W/4, 4C) -> dark2 conv1 pre-BN
    output (B, H/4, W/4, C2), identical layout to the plain path."""
    wb = fold_next_kernel(wd)
    return lax.conv_general_dilated(
        a, wb.astype(a.dtype), (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=_DN)


# ---------------------------------------------------------------------------
# int8 composition (the PTQ serving modes, yolox_tpu/ops/quant.py)
#
# Both folds are per-output-channel re-indexings of the plain kernels, so
# the quantization algebra composes exactly: BN folds into the UNfolded
# kernel first (fold_bn is per-output-channel, the stem fold only tiles
# the output axis, the next fold doesn't touch it), per-channel weight
# amaxes of the folded kernel equal the plain kernel's (structural zeros
# don't raise an abs-max), and the calibrated activation scales transfer
# (per-tensor: reshapes don't change values; per-channel: `tile4`).
# Consequence: the int8 codes and int32 accumulations are bit-identical
# to the plain quantized path modulo spatial layout.
# ---------------------------------------------------------------------------

def _conv_a_int8(wa_fused, x, sx):
    """Quantized conv A: reshaped image codes x folded-kernel codes."""
    from yolox_tpu.ops import quant

    b, h, w, _ = x.shape
    y = x.reshape(b, h, w // 4, 12)
    xq = quant.quantize(y, sx)
    wq, sw = quant.weight_qparams(wa_fused)
    acc = lax.conv_general_dilated(
        xq, wq, (4, 1), ((2, 2), (1, 1)), dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    return acc, sx * sw


def stem_blocked_ladder(p_stem, p_next, x, amax_stem, amax_next,
                        act_stem, act_next, out_dtype):
    """Both folded convs in per-block int8 ladder mode
    (`quant.conv_bn_act` algebra at the folded shapes/strides).

    `amax_stem`/`amax_next` are the plain path's per-tensor calibration
    entries (`<path>.stem.conv` / `<path>.dark2.0`): the reshape into
    blocked layout is value-preserving, so the scales transfer exactly.
    Returns the dark2.0 activation in the plain path's layout.
    """
    from yolox_tpu.ops import quant

    w_fused, bias = quant.fold_bn(p_stem["conv"]["conv"]["weight"],
                                  p_stem["conv"]["bn"])
    wa = fold_stem_kernel(w_fused)
    acc, scale = _conv_a_int8(wa, x, quant.act_scale(amax_stem))
    a = act_stem(acc.astype(jnp.float32) * scale + jnp.tile(bias, 4))

    w2_fused, bias2 = quant.fold_bn(p_next["conv"]["weight"], p_next["bn"])
    wb = fold_next_kernel(w2_fused)
    sx2 = quant.act_scale(amax_next)
    aq = quant.quantize(a, sx2)
    wq2, sw2 = quant.weight_qparams(wb)
    acc2 = lax.conv_general_dilated(
        aq, wq2, (1, 1), ((1, 0), (1, 0)), dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    y = act_next(acc2.astype(jnp.float32) * (sx2 * sw2) + bias2)
    return y.astype(out_dtype)


def stem_blocked_hbm(p_stem, p_next, x, amax_stem_out, amax_next_out,
                     act_stem, act_next):
    """Both folded convs in int8-in-HBM mode (`quant.conv_bn_act_hbm`
    algebra): conv A stays float like the plain path's 3-channel stem,
    its output requantizes at the 4x-tiled per-channel stem amax, conv B
    folds the incoming scale into its BN-folded weights and emits the
    dark2.0 QTensor the CSP layer consumes.
    """
    from yolox_tpu.ops import quant

    from yolox_tpu.models.blocks import EVAL_CTX, batch_norm

    a = stem_conv_blocked(p_stem["conv"]["conv"]["weight"], x)
    a = act_stem(batch_norm(tile4(p_stem["conv"]["bn"]), a, EVAL_CTX,
                            "stem_s2d.bn"))
    qa = quant.requant(a, jnp.tile(jnp.asarray(amax_stem_out), 4))

    w_fused, bias = quant.fold_bn(p_next["conv"]["weight"], p_next["bn"])
    wb = fold_next_kernel(w_fused)
    w_eff = quant.fold_in_scale(wb, qa.scale, 1)
    wq, sw = quant.weight_qparams(w_eff)
    acc = lax.conv_general_dilated(
        qa.codes, wq, (1, 1), ((1, 0), (1, 0)), dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    y = act_next(acc.astype(jnp.float32) * sw + bias)
    return quant.requant(y, amax_next_out)
