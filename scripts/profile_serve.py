#!/usr/bin/env python
"""Serving-path breakdown on the real chip: where do the ms go?

Cumulative stages of the fused serving graph (backbone -> head raw ->
decode+top-k select -> NMS), each timed as ONE jitted graph of `iters`
checksum-chained repetitions (same methodology as profile_train.py /
bench.py — robust to tunneled-TPU dispatch timing). Also prints each
stage's `cost_analysis()` flops + bytes and the implied MXU/HBM roofline
so the distance-to-roofline per model is a printed fact, not a guess.

Usage:
  python scripts/profile_serve.py [--model nano] [--batch 256] [--iters 8]
      [--trace /tmp/serve_trace]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS = 197e12   # v5e bf16 MXU
PEAK_BYTES = 819e9    # v5e HBM


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="nano")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--max-det", type=int, default=256)
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import SERVE_BATCH
    from yolox_tpu import YoloxConfig, YoloxModule
    from yolox_tpu.ops.nms import postprocess_fused

    cfg = YoloxConfig.get_named_config(f"yolox_{args.model}")
    module = YoloxModule.from_config(cfg, dtype=jnp.bfloat16)
    size = cfg.test_size[0]
    b = args.batch or SERVE_BATCH[args.model]
    iters = args.iters
    p = module.params

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (b, size, size, 3)), jnp.float32)

    def backbone_only(pp, xin):
        fpn = module.backbone(pp["backbone"], xin.astype(jnp.bfloat16))
        return sum(jnp.sum(f[:, 0, 0, :4].astype(jnp.float32)) for f in fpn)

    def head_raw(pp, xin):
        fpn = module.backbone(pp["backbone"], xin.astype(jnp.bfloat16))
        raw, grid, stride = module.head.forward_raw(pp["head"], fpn)
        return jnp.sum(raw[:, 0, :4].astype(jnp.float32))

    def full_serve(pp, xin):
        dets, valid = module.serve(
            pp, xin, conf_thre=0.5, nms_thre=cfg.nmsthre,
            class_agnostic=False, max_det=args.max_det)
        return jnp.sum(dets[:, 0, 0])

    def chain(step_of_x):
        def run(pp, x0):
            def body(i, checksum):
                xi = x0 + checksum * 1e-12 + jnp.float32(i) * 1e-6
                return checksum * 0.5 + step_of_x(pp, xi)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        return jax.jit(run)

    def best_of(fn, repeats=3):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    results = []

    def bench(tag, step_of_x):
        run = chain(step_of_x)
        lowered = jax.jit(step_of_x).lower(p, x).compile()
        ca = lowered.cost_analysis()
        flops = float(ca.get("flops", 0.0))
        bytes_ = float(ca.get("bytes accessed", 0.0))
        np.asarray(run(p, x))  # compile + warmup
        dt = best_of(lambda: np.asarray(run(p, x))) / iters
        row = {
            "stage": tag,
            "ms": round(dt * 1000, 3),
            "img_per_s": round(b / dt, 1),
            "gflops": round(flops / 1e9, 1),
            "gbytes": round(bytes_ / 1e9, 3),
            "mxu_roofline_ms": round(1000 * flops / PEAK_FLOPS, 3),
            "hbm_roofline_ms": round(1000 * bytes_ / PEAK_BYTES, 3),
            "mfu_pct": round(100 * flops / PEAK_FLOPS / dt, 1),
            "hbm_pct": round(100 * bytes_ / PEAK_BYTES / dt, 1),
        }
        results.append(row)
        print(f"{tag:28s} {row['ms']:8.3f} ms  {row['img_per_s']:9.1f} "
              f"img/s  flop-bound {row['mxu_roofline_ms']:6.3f} ms  "
              f"byte-bound {row['hbm_roofline_ms']:6.3f} ms  "
              f"MFU {row['mfu_pct']:5.1f}%  HBM {row['hbm_pct']:5.1f}%")

    bench("backbone", backbone_only)
    bench("backbone+head raw", head_raw)
    bench("full serve (+decode+NMS)", full_serve)
    print(json.dumps(results))

    if args.trace:
        run = chain(full_serve)
        np.asarray(run(p, x))
        with jax.profiler.trace(args.trace):
            np.asarray(run(p, x))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
