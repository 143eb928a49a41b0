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

import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")

# Reference Focus quadrant order (TL, BL, TR, BR) = (dy, dx); also used
# for the (a, b) output-block order so conv B's consumer mapping is fixed.
QUAD = ((0, 0), (1, 0), (0, 1), (1, 1))


def fold_stem_kernel(w1):
    """(3, 3, 12, C) Focus conv kernel -> (8, 3, 12, 4C) conv-A kernel.

    Input channel s*3+c of the reshaped (B, H, W/4, 12) image is raw
    pixel column offset s in [0,4); the kernel row covers raw rows
    4p-2..4p+5 at stride 4. For each output block position (a, b) and
    original tap (u, v, quadrant g=(dy, dx)): the raw pixel read is
    row 4p + 2(a+u-1)+dy, col 4q + 2(b+v-1)+dx.
    """
    c = w1.shape[3]
    wa = jnp.zeros((8, 3, 12, 4 * c), w1.dtype)
    for bi, (a, b) in enumerate(QUAD):
        for u in range(3):
            for v in range(3):
                for gi, (dy, dx) in enumerate(QUAD):
                    rowoff = 2 * (a + u - 1) + dy          # in [-2, 5]
                    coloff = 2 * (b + v - 1) + dx          # in [-2, 5]
                    dq, s = coloff // 4, coloff % 4
                    wa = wa.at[rowoff + 2, dq + 1,
                               s * 3:s * 3 + 3,
                               bi * c:(bi + 1) * c].set(
                        w1[u, v, gi * 3:(gi + 1) * 3])
    return wa


def fold_next_kernel(wd):
    """(3, 3, C, C2) stride-2 conv kernel -> (2, 2, 4C, C2) on blocks.

    Consumes conv A's blocked channels (bi*C + o): the original tap at
    stem-grid row 2m+u-1 lives in block row m + (u-2)//2... precisely,
    t = u-1 -> (dp, a) = (t//2, t%2), a 2-tap window with pad (1, 0).
    """
    c, c2 = wd.shape[2], wd.shape[3]
    wb = jnp.zeros((2, 2, 4 * c, c2), wd.dtype)
    for u in range(3):
        dp, a = (u - 1) // 2, (u - 1) % 2
        for v in range(3):
            dq, b = (v - 1) // 2, (v - 1) % 2
            bi = QUAD.index((a, b))
            wb = wb.at[dp + 1, dq + 1, bi * c:(bi + 1) * c].set(wd[u, v])
    return wb


def tile4(bn_params):
    """BN parameter dict -> the same dict tiled 4x (slot-major blocks)."""
    return {k: (jnp.tile(v, 4) if getattr(v, "ndim", 0) == 1 else v)
            for k, v in bn_params.items()}


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
