"""Batch-1 stem study: host-side space-to-depth x4 + MXU-shaped stem convs.

The round-4 batch-1 profile (docs/serving_performance.md) pins 65% of
yolox-s batch-1 device time on XLA's C_in=3 stem lowering (VPU spatial
blocking at 0.6% MFU + 345us of boundary layout copies). The classic fix
is the space-to-depth-conv transform; the earlier attempt applied it
DEVICE-side to C_in=12 and lost to the same layout assembly.

This study moves the space-to-depth to the HOST (a pure relayout of the
same 2.4MB the processor already writes) and goes one level deeper:

  input  Y = s2d4(X): (B, H/4, W/4, 48)            [host, numpy strides]
  conv A = 3x3 s1 p1, 48 -> 4C: computes the stem's (2x2 output block
           per position) so no depth-to-space is ever materialized
  BN+SiLU with channel-tiled stem scales
  conv B = 2x2 s1 pad((1,0),(1,0)), 4C -> 2C: dark2's first 3x3 stride-2
           conv with the depth-to-space folded into its kernel
  -> (B, H/4, W/4, 2C): exactly the baseline stem+dark2conv1 region.

Both folds are exact tap re-indexings (zero-padded to the dense K): the
only numeric difference from the production region is conv reduction
reassociation. K rises from 108 to 432 (A) and 288 to 512C/C (B) — 4x /
1.78x the FLOPs — but both contractions are MXU-shaped (K >= 432,
C_out 4C >= 128 for s), where the baseline runs the VPU at 0.6% MFU.

Run on the TPU: python scripts/stem_s2d_study.py [--batch 1] [--iters 256]
Reference for the region being replaced: blocks.py:Focus (folded stem),
darknet.py:CspDarknet.dark2[0].
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")
QUAD = [(0, 0), (1, 0), (0, 1), (1, 1)]  # reference Focus concat order


def fold_focus_kernel(w1):
    """(3,3,12,C) stem conv on s2d2 input -> (6,6,3,C) stride-2 conv."""
    c = w1.shape[3]
    wb = np.zeros((6, 6, 3, c), w1.dtype)
    for g, (dy, dx) in enumerate(QUAD):
        for u in range(3):
            for v in range(3):
                wb[dy + 2 * u, dx + 2 * v] = w1[u, v, g * 3:(g + 1) * 3]
    return wb


def s2d4(x):
    """(B, H, W, 3) -> (B, H/4, W/4, 48), channel = r*12 + s*3 + c.

    Natural raster order (row offset r, col offset s within each 4x4
    block): a single reshape+transpose copy, both in numpy and in XLA.
    The Focus group permutation is baked into conv A's kernel instead.
    """
    b, h, w, _ = x.shape
    return (x.reshape(b, h // 4, 4, w // 4, 4, 3)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h // 4, w // 4, 48))


def s2d4_dev(x):
    """Device-side s2d4 (same layout), jit-traceable."""
    b, h, w, _ = x.shape
    return (x.reshape(b, h // 4, 4, w // 4, 4, 3)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h // 4, w // 4, 48))


def conv_a_kernel(w1):
    """(3,3,12,C) -> (3,3,48,4C): stem conv over s2d4, 2x2 output blocks.

    Input channel r*12+s*3+c (natural s2d4 raster); output channel
    bi*C+o where bi = QUAD index of the (a,b) position inside the 2x2
    output block this position computes.
    """
    c = w1.shape[3]
    wa = np.zeros((3, 3, 48, 4 * c), w1.dtype)
    for bi, (a, b) in enumerate(QUAD):
        for u in range(3):
            t = a + u - 1
            dp, fy = t // 2, t % 2
            for v in range(3):
                s_ = b + v - 1
                dq, fx = s_ // 2, s_ % 2
                for gi, (dy, dx) in enumerate(QUAD):
                    r, s = 2 * fy + dy, 2 * fx + dx
                    k = r * 12 + s * 3
                    wa[dp + 1, dq + 1, k:k + 3,
                       bi * c:(bi + 1) * c] = w1[u, v, gi * 3:(gi + 1) * 3]
    return wa


def conv_a3_kernel(w1):
    """(3,3,12,C) -> (8,3,12,4C): stem conv over the transpose-free fold.

    Input is the FREE reshape (B,H,W,3) -> (B,H,W/4,12) (horizontal 4x
    fold into channels, channel = s*3+c); the vertical 4x fold is
    absorbed into an 8-tall kernel at row-stride 4 (pad (2,2)). Output
    channel bi*C+o as in conv_a_kernel. K = 8*3*12 = 288 (2.67x the
    logical 108), zero transposes or gathers anywhere.
    """
    c = w1.shape[3]
    wa = np.zeros((8, 3, 12, 4 * c), w1.dtype)
    for bi, (a, b) in enumerate(QUAD):
        for u in range(3):
            for v in range(3):
                for gi, (dy, dx) in enumerate(QUAD):
                    rowoff = 2 * (a + u - 1) + dy          # in [-2, 5]
                    coloff = 2 * (b + v - 1) + dx          # in [-2, 5]
                    dq, s = coloff // 4, coloff % 4
                    wa[rowoff + 2, dq + 1, s * 3:s * 3 + 3,
                       bi * c:(bi + 1) * c] = w1[u, v, gi * 3:(gi + 1) * 3]
    return wa


def conv_a4_kernel(w1):
    """(3,3,12,C) -> (6,3,6,C): the zero-overhead half fold.

    Input is the FREE reshape (B,H,W,3) -> (B,H,W/2,6) (horizontal 2x
    fold, channel = s*3+c, s in {0,1}); vertical 2x is absorbed into a
    6-tall kernel at row-stride 2 (pad (2,2)), horizontal stride 1 on
    the W/2 axis (pad (1,1)). K = 6*3*6 = 108 — exactly the logical tap
    count, no structural zeros, and the output is the UNBLOCKED stem
    (B,H/2,W/2,C): downstream needs no changes at all.
    """
    c = w1.shape[3]
    wa = np.zeros((6, 3, 6, c), w1.dtype)
    for u in range(3):
        for v in range(3):
            for gi, (dy, dx) in enumerate(QUAD):
                kh = 2 * (u - 1) + dy + 2                   # in [0, 6)
                wa[kh, v, dx * 3:dx * 3 + 3] = w1[u, v, gi * 3:(gi + 1) * 3]
    return wa


def conv_b_kernel(wd):
    """(3,3,C,C2) dark2 stride-2 conv -> (2,2,4C,C2) on blocked channels."""
    c, c2 = wd.shape[2], wd.shape[3]
    wbk = np.zeros((2, 2, 4 * c, c2), wd.dtype)
    for u in range(3):
        t = u - 1
        dp, a = t // 2, t % 2
        for v in range(3):
            s = v - 1
            dq, b = s // 2, s % 2
            bi = QUAD.index((a, b))
            wbk[dp + 1, dq + 1, bi * c:(bi + 1) * c] = wd[u, v]
    return wbk


def silu(x):
    return x * jax.nn.sigmoid(x)


def timed_loop(step_fn, x, iters):
    def run(x0):
        def body(i, checksum):
            xi = x0 + checksum * 1e-12 + jnp.float32(i) * 1e-6
            return jnp.sum(step_fn(xi).astype(jnp.float32)) * 1e-6 \
                + checksum * 0.5
        return lax.fori_loop(0, iters, body, jnp.float32(0))
    return jax.jit(run)


def best_of(fn, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=256)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--cout", type=int, default=32, help="stem C (s=32)")
    args = ap.parse_args()
    B, H, C = args.batch, args.size, args.cout

    rng = np.random.default_rng(0)
    w1 = (rng.standard_normal((3, 3, 12, C)) * 0.1).astype(np.float32)
    wd = (rng.standard_normal((3, 3, C, 2 * C)) * 0.05).astype(np.float32)
    s1 = (1 + 0.1 * rng.standard_normal(C)).astype(np.float32)
    t1 = (0.1 * rng.standard_normal(C)).astype(np.float32)
    s2 = (1 + 0.1 * rng.standard_normal(2 * C)).astype(np.float32)
    t2 = (0.1 * rng.standard_normal(2 * C)).astype(np.float32)

    wb = jnp.asarray(fold_focus_kernel(w1))
    wa = jnp.asarray(conv_a_kernel(w1))
    wa3 = jnp.asarray(conv_a3_kernel(w1))
    wa4 = jnp.asarray(conv_a4_kernel(w1))
    wbk = jnp.asarray(conv_b_kernel(wd))
    wd_j = jnp.asarray(wd)
    s1t, t1t = jnp.asarray(np.tile(s1, 4)), jnp.asarray(np.tile(t1, 4))
    s1j, t1j = jnp.asarray(s1), jnp.asarray(t1)
    s2j, t2j = jnp.asarray(s2), jnp.asarray(t2)

    def baseline(x, prec=None):  # (B,H,W,3) -> (B,H/4,W/4,2C); production
        y = lax.conv_general_dilated(x, wb.astype(x.dtype), (2, 2),
                                     ((2, 2), (2, 2)), dimension_numbers=DN,
                                     precision=prec)
        y = silu(y * s1j + t1j)
        z = lax.conv_general_dilated(y, wd_j.astype(y.dtype), (2, 2),
                                     ((1, 1), (1, 1)), dimension_numbers=DN,
                                     precision=prec)
        return silu(z * s2j + t2j)

    def variant(yy, prec=None):  # (B,H/4,W/4,48) -> (B,H/4,W/4,2C)
        a = lax.conv_general_dilated(yy, wa.astype(yy.dtype), (1, 1),
                                     ((1, 1), (1, 1)), dimension_numbers=DN,
                                     precision=prec)
        a = silu(a * s1t + t1t)
        z = lax.conv_general_dilated(a, wbk.astype(a.dtype), (1, 1),
                                     ((1, 0), (1, 0)), dimension_numbers=DN,
                                     precision=prec)
        return silu(z * s2j + t2j)

    def variant3(x, prec=None):  # (B,H,W,3), transpose-free fold
        b, h, w, _ = x.shape
        y3 = x.reshape(b, h, w // 4, 12)
        a = lax.conv_general_dilated(y3, wa3.astype(x.dtype), (4, 1),
                                     ((2, 2), (1, 1)), dimension_numbers=DN,
                                     precision=prec)
        a = silu(a * s1t + t1t)
        z = lax.conv_general_dilated(a, wbk.astype(a.dtype), (1, 1),
                                     ((1, 0), (1, 0)), dimension_numbers=DN,
                                     precision=prec)
        return silu(z * s2j + t2j)

    def variant4(x, prec=None):  # zero-overhead half fold + plain dark2c1
        b, h, w, _ = x.shape
        y4 = x.reshape(b, h, w // 2, 6)
        y = lax.conv_general_dilated(y4, wa4.astype(x.dtype), (2, 1),
                                     ((2, 2), (1, 1)), dimension_numbers=DN,
                                     precision=prec)
        y = silu(y * s1j + t1j)
        z = lax.conv_general_dilated(y, wd_j.astype(y.dtype), (2, 2),
                                     ((1, 1), (1, 1)), dimension_numbers=DN,
                                     precision=prec)
        return silu(z * s2j + t2j)

    # --- exactness (f32, full-precision contractions) ---
    x_np = rng.standard_normal((B, H, H, 3)).astype(np.float32)
    y_np = s2d4(x_np)
    hi = lax.Precision.HIGHEST
    ref = np.asarray(jax.jit(lambda x: baseline(x, hi))(jnp.asarray(x_np)))
    got = np.asarray(jax.jit(lambda y: variant(y, hi))(jnp.asarray(y_np)))
    err = np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9)
    print(f"f32 rel max err (reassociation only): {err:.2e}")
    assert err < 1e-5, "transform is not numerically faithful"
    got3 = np.asarray(jax.jit(lambda x: variant3(x, hi))(jnp.asarray(x_np)))
    err3 = np.max(np.abs(ref - got3)) / (np.max(np.abs(ref)) + 1e-9)
    print(f"f32 rel max err, transpose-free fold: {err3:.2e}")
    assert err3 < 1e-5, "v3 transform is not numerically faithful"
    got4 = np.asarray(jax.jit(lambda x: variant4(x, hi))(jnp.asarray(x_np)))
    err4 = np.max(np.abs(ref - got4)) / (np.max(np.abs(ref)) + 1e-9)
    print(f"f32 rel max err, half fold:           {err4:.2e}")
    assert err4 < 1e-5, "v4 transform is not numerically faithful"

    # --- timing (bf16, chained fori_loop like bench.py) ---
    xb = jnp.asarray(x_np, jnp.bfloat16)
    yb = jnp.asarray(y_np, jnp.bfloat16)
    xu8 = jnp.asarray((x_np * 64 + 128).clip(0, 255).astype(np.uint8))

    def variant_dev(x):  # device-side relayout + convA/convB, same API
        return variant(s2d4_dev(x))

    def variant_dev_u8(x):  # uint8 input: relayout the 1-byte codes first
        return variant(s2d4_dev(x).astype(jnp.bfloat16))

    def variant3_u8(x):
        return variant3(x.astype(jnp.bfloat16))

    rows = {}
    for name, fn, inp in [("baseline stem+d2c1    ", baseline, xb),
                          ("s2d4(host) convA+convB", variant, yb),
                          ("s2d4(dev)  convA+convB", variant_dev, xb),
                          ("s2d4(dev,u8) convA+B  ", variant_dev_u8, xu8),
                          ("reshape conv8x3+convB ", variant3, xb),
                          ("reshape(u8) conv8x3+B ", variant3_u8, xu8),
                          ("halffold conv6x3+plain", variant4, xb),
                          ("halffold(u8) conv6x3  ",
                           lambda x: variant4(x.astype(jnp.bfloat16)),
                           xu8)]:
        run = timed_loop(fn, inp, args.iters)
        run(inp).block_until_ready()  # compile
        dt = best_of(lambda r=run, i=inp: r(i).block_until_ready())
        us = 1e6 * dt / args.iters
        rows[name] = us
        print(f"{name}: {us:9.1f} us/iter  (b={B}, {us / B:.1f} us/img)")
    base = rows["baseline stem+d2c1    "]
    for name, us in rows.items():
        if us is not base:
            print(f"  {name.strip()}: {base / us:.2f}x")

    # host s2d4 relayout cost (numpy, per batch)
    for dt_name, arr in [("f32", x_np),
                         ("u8", (x_np * 64).astype(np.uint8))]:
        t0 = time.perf_counter()
        for _ in range(10):
            np.ascontiguousarray(s2d4(arr))
        print(f"host s2d4 ({dt_name}): "
              f"{(time.perf_counter() - t0) / 10 * 1e3:.2f} ms/batch")


if __name__ == "__main__":
    main()
