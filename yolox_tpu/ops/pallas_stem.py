"""Pallas stem kernel: the Focus conv as an explicit im2col MXU matmul.

Why this exists: the folded Focus stem (one 2k x 2k stride-2 conv on the
raw 3-channel image, `models/blocks.py:Focus`) is the one conv XLA cannot
schedule well at small batch — with C_in = 3 the conv lowers to a VPU
elementwise fusion over a spatially-blocked layout plus layout copies on
both sides. Measured on a v5e chip at batch 1 (yolox-s 640px): the stem
conv runs at 0.6% MFU and, with its copies, accounts for ~65% of the whole
serve graph's device time (docs/serving_performance.md, round-4 profile).

Layout is the whole game. A 3-channel NHWC tensor cannot feed a Pallas
kernel directly (the default layout pads 3 lanes to 128 — a 42x byte
blowup), and Mosaic cannot lane-concat or roll the bf16 tap slices either
(both were tried; NotImplemented). So the kernel takes the image in a
PARITY-SEPARATED space-to-depth form with wide minor dims:

    xs2d (B, 12, HP, WP) uint8/bf16,
    xs2d[b, (parR*2 + parC)*3 + c, pr, pc] = padded_img[2*pr + parR,
                                                        2*pc + parC, c]

where HP = H/2 + k, WP = W/2 + k include the conv's 'same' border. In that
form every im2col tap (u = 2*i2 + parR, v = 2*j2 + parC, channel c) is a
contiguous (RB, W_out) slab, so the DMA engine assembles the whole
(12k^2, RB, W_out) patch tensor with one copy per tap — zero vector
relayout ops — and one MXU dot against the (12k^2, C_out) kernel finishes
the conv, with eval-mode BN + activation fused into the epilogue.

The s2d form itself is free where it matters: `YoloxProcessor` can emit it
during host-side letterboxing (a strided uint8 copy; also 4x less H2D
transfer than f32), and `s2d_prepare` builds it on-device for raw-tensor
callers (one XLA relayout of the image).

Reference semantics owner: `/root/reference/yolox/models/network_blocks.py:186-208`
(Focus = space-to-depth then ksize conv); this kernel computes the folded
form (blocks.Focus._space_to_depth_kernel) bit-compatibly in bf16/f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PARITIES = ((0, 0), (0, 1), (1, 0), (1, 1))


def _pick_rb(h_out: int, w_out: int, max_rows: int = 16384) -> int:
    """Largest divisor RB of h_out with RB * w_out <= max_rows."""
    best = 0
    for rb in range(1, h_out + 1):
        if h_out % rb == 0 and rb * w_out <= max_rows:
            best = rb
    return best


def supports(x_shape, k: int = 3) -> bool:
    """Whether the (B, H, W, 3) image shape can route through the kernel."""
    if len(x_shape) != 4:
        return False
    b, h, w, c = x_shape
    if c != 3 or h % 2 or w % 2:
        return False
    return _pick_rb(h // 2, w // 2) >= 8


def s2d_prepare(x, k: int = 3):
    """(B, H, W, 3) image -> flat space-to-depth form (B, HP, WP * 12).

    Pads the conv border (zeros — BN bias is applied after the matmul, so
    zero padding is exact) and interleaves the 2x2 spatial parities with
    the channels on the minor axis: lane pc * 12 + (parR * 2 + parC) * 3
    + c. The flat minor dim keeps the Pallas input unpadded (a 3- or
    12-lane minor would blow up 42x/10.7x under the default tiled
    layout). One XLA relayout; on the host path
    (`YoloxProcessor(..., s2d=True)`) numpy does this during letterboxing
    instead and the device never sees the NHWC form.
    """
    b, h, w, c = x.shape
    assert c == 3 and h % 2 == 0 and w % 2 == 0, (x.shape,)
    xp = jnp.pad(x, ((0, 0), (k - 1, k + 1), (k - 1, k + 1), (0, 0)))
    hp, wp = h // 2 + k, w // 2 + k
    x6 = xp.reshape(b, hp, 2, wp, 2, 3)
    return x6.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, 12)


def _stem_kernel(xs2d_hbm, w_ref, scale_ref, bias_ref, out_ref, patch, sems,
                 *, rb: int, w_out: int, k: int, act, cdtype,
                 zero_tail: bool):
    b = pl.program_id(0)
    i = pl.program_id(1)
    # 1. the DMA engine assembles the im2col patch tensor: one copy per
    #    tap (i2, j2), each a fully coalesced (rb, w_out, 12) slab read
    #    through a reshaped view of the flat (HP, WP*12) image — no
    #    vector relayout ops anywhere
    dmas = []
    for i2 in range(k):
        for j2 in range(k):
            t = i2 * k + j2
            d = pltpu.make_async_copy(
                xs2d_hbm.at[b, pl.ds(i * rb + i2, rb), pl.ds(j2, w_out),
                            slice(None)],
                patch.at[:, :, pl.ds(12 * t, 12)],
                sems.at[t])
            d.start()
            dmas.append(d)
    if zero_tail:
        # float inputs: the unused K lanes could hold NaN garbage which
        # 0-weights would not mask (NaN * 0 = NaN); uint8 cannot
        patch[:, :, 12 * k * k:] = jnp.zeros(
            (rb, w_out, 128 - 12 * k * k), patch.dtype)
    for d in dmas:
        d.wait()
    # 2. one MXU dot + fused BN/act epilogue. The (rb, w_out) -> M merge
    #    and the M -> (rb, w_out) split are major/sublane reshapes (legal);
    #    K lives on lanes, padded to 128 with zero weight rows.
    pt = patch[:].astype(cdtype).reshape(rb * w_out, 128)
    acc = jnp.dot(pt, w_ref[:], preferred_element_type=jnp.float32)
    y = act(acc * scale_ref[0] + bias_ref[0])
    out_ref[0] = y.reshape(rb, w_out, out_ref.shape[-1]).astype(out_ref.dtype)


def stem_conv_bn_act_s2d(xs2d, wb, bn_scale, bn_bias, act, k: int = 3,
                         out_dtype=jnp.bfloat16):
    """Fused Focus stem on the parity-separated s2d image form.

    xs2d: (B, HP, WP * 12) uint8/bf16/f32 from `s2d_prepare` (or the host
    processor). wb: (2k, 2k, 3, C_out) folded kernel
    (blocks.Focus._space_to_depth_kernel). bn_scale/bn_bias: (C_out,) f32
    eval-mode BN fold. Returns (B, H/2, W/2, C_out) in `out_dtype`.
    """
    assert 12 * k * k <= 128, k
    bsz, hp, wp, twelve = xs2d.shape
    assert twelve == 12, (xs2d.shape,)
    h_out, w_out = hp - k, wp - k
    cout = wb.shape[3]
    rb = _pick_rb(h_out, w_out)
    assert rb >= 8, (h_out, w_out)

    cdtype = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32
    # K order: ((i2 * k + j2) * 4 + parR * 2 + parC) * 3 + c, matching the
    # kernel's tap order; u = 2 * i2 + parR, v = 2 * j2 + parC. Rows
    # 12k^2..127 are zero so the patch tail lanes never contribute.
    wmat = (wb.astype(cdtype)
            .reshape(k, 2, k, 2, 3, cout)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(k * k * 12, cout))
    wmat = jnp.concatenate(
        [wmat, jnp.zeros((128 - 12 * k * k, cout), cdtype)], axis=0)

    zero_tail = xs2d.dtype != jnp.uint8
    kernel = functools.partial(
        _stem_kernel, rb=rb, w_out=w_out, k=k, act=act,
        cdtype=cdtype, zero_tail=zero_tail)
    grid = (bsz, h_out // rb)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, h_out, w_out, cout), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # must stay in HBM: the
            # kernel DMAs through a reshaped ref view (VMEM tiling breaks it)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wmat
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bn scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bn bias
        ],
        out_specs=pl.BlockSpec(
            (1, rb, w_out, cout), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rb, w_out, 128), xs2d.dtype),
            pltpu.SemaphoreType.DMA((k * k,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h_out * w_out * 12 * k * k * cout,
            bytes_accessed=(9 * xs2d.size * xs2d.dtype.itemsize
                            + bsz * h_out * w_out * cout * 2),
            transcendentals=bsz * h_out * w_out * cout,
        ),
    )(xs2d, wmat, bn_scale.astype(jnp.float32).reshape(1, cout),
      bn_bias.astype(jnp.float32).reshape(1, cout))


def stem_conv_bn_act(x, wb, bn_scale, bn_bias, act, k: int = 3):
    """NHWC-image entry point: s2d_prepare (one XLA relayout) + kernel."""
    return stem_conv_bn_act_s2d(
        s2d_prepare(x, k), wb, bn_scale, bn_bias, act, k,
        out_dtype=x.dtype if x.dtype != jnp.uint8 else jnp.bfloat16)
