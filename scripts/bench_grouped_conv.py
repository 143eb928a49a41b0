#!/usr/bin/env python
"""Measure TPU grouped-conv efficiency for batch-dim lane packing.

Question this answers (on the real chip): if we fold k images into the
channel dimension of a small-channel model (slot-major layout), every conv
becomes a `feature_group_count=k` grouped conv over k*C lane-dense channels.
Total FLOPs and logical bytes are unchanged, but tiled-layout padding
(lane dim -> 128) drops by ~k when C < 128 — which is pure wall-clock on a
bandwidth-bound model (see scripts/serve_traffic_model.py: yolox-nano moves
49 GB padded vs 10.3 GB logical per 256-image batch).

The unknown is XLA's TPU grouped-conv emitter: does a small-group conv run
as one block-diagonal-weights matmul at lane-dense speed, or does it
serialize/pad per group and eat the win? This benchmark measures exactly
that, per representative nano/tiny stage shape:

  baseline : conv (B, H, H, C) -> (B, H, H, Co), groups=1
  packed-k : conv (B/k, H, H, k*C) -> (B/k, H, H, k*Co), groups=k

plus the depthwise variant (nano is a depthwise model: groups=C baseline
vs groups=k*C packed). Equal work across rows of a block; time ratios are
the emitter efficiency. Prints ms / TFLOP/s / logical+padded GB/s per row.

Usage: python scripts/bench_grouped_conv.py [--iters 20] [--batch 256]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS = 197e12
PEAK_BYTES = 819e9


def padded_bytes(shape, itemsize=2, lane=128):
    sub = 8 * (4 // itemsize)
    dims = list(shape)
    dims[-1] = -(-dims[-1] // lane) * lane
    if len(dims) >= 2:
        dims[-2] = -(-dims[-2] // sub) * sub
    n = 1
    for d in dims:
        n *= d
    return n * itemsize


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--ks", default="1,2,4,8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    B = args.batch
    ks = [int(k) for k in args.ks.split(",")]

    # (tag, H, C_in, C_out, ksize, depthwise) — representative nano/tiny
    # serving stage shapes at 416 px (nano widths .25: 16/32/64/128; tiny
    # .375: 48/96).  Depthwise rows model nano's DWConv spatial half.
    cases = [
        ("nano dark2 3x3", 104, 32, 32, 3, False),
        ("nano dark3 3x3", 52, 64, 64, 3, False),
        ("nano dark4 3x3", 26, 128, 128, 3, False),
        ("nano 1x1 c32", 104, 32, 32, 1, False),
        ("nano dw3x3 c64", 52, 64, 64, 3, True),
        ("tiny dark2 3x3", 104, 48, 48, 3, False),
        ("tiny dark3 3x3", 52, 96, 96, 3, False),
    ]

    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))

    def timed(fn, x, w, iters):
        def run(x0, w0):
            def body(i, c):
                xi = x0 + (c * 1e-12 + jnp.bfloat16(i) * 1e-6).astype(x0.dtype)
                out = fn(xi, w0)
                return jnp.sum(out[:, 0, 0, :1].astype(jnp.float32)) + c * 0.5
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        rj = jax.jit(run)
        np.asarray(rj(x, w))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(rj(x, w))
            best = min(best, time.perf_counter() - t0)
        return best / iters

    print(f"{'case':<18}{'k':>3}{'shape':>22}{'ms':>8}{'TF/s':>7}"
          f"{'logGB/s':>9}{'padGB/s':>9}{'vs k=1':>8}")
    for tag, H, ci, co, ksz, dw in cases:
        base_ms = None
        for k in ks:
            b = B // k
            if b * k != B:
                continue
            rng = np.random.default_rng(0)
            x = jnp.asarray(rng.normal(size=(b, H, H, k * ci)),
                            jnp.bfloat16)
            groups = k * ci if dw else k
            w = jnp.asarray(rng.normal(
                size=(ksz, ksz, (k * ci) // groups, k * co)) * 0.05,
                jnp.bfloat16)

            def conv(xi, wi, groups=groups):
                return lax.conv_general_dilated(
                    xi, wi, (1, 1), "SAME", dimension_numbers=dn,
                    feature_group_count=groups,
                    preferred_element_type=jnp.bfloat16)

            dt = timed(conv, x, w, args.iters)
            # total MACs: B*H*H*Co*(ksz^2 * Ci-per-group-output)
            flops = 2 * B * H * H * co * ksz * ksz * (1 if dw else ci)
            log_gb = 2 * (b * H * H * k * ci + b * H * H * k * co) / 1e9
            pad_gb = (padded_bytes((b, H, H, k * ci))
                      + padded_bytes((b, H, H, k * co))) / 1e9
            if k == 1:
                base_ms = dt * 1e3
            print(f"{tag:<18}{k:>3}{f'{b}x{H}x{H}x{k*ci}':>22}"
                  f"{dt*1e3:>8.3f}{flops/dt/1e12:>7.1f}"
                  f"{log_gb/dt:>9.0f}{pad_gb/dt:>9.0f}"
                  f"{(base_ms/(dt*1e3)):>8.2f}x")
        print()


if __name__ == "__main__":
    main()
