#!/usr/bin/env python
"""Analytic HBM-traffic model of the serving forward (no TPU needed).

Walks the jaxpr of the fused serving forward (backbone + raw head), collects
every convolution's operand/result shapes, and charges each conv one read of
its input and one write of its output in the compute dtype — once logically,
and once under v5e tiled-layout padding (minor/lane dim -> 128, second-minor/
sublane dim -> 8 f32-equivalent rows, i.e. 16 rows for 2-byte types). Weights
and fused elementwise ops are ignored (both are small next to activations).

This is the model that motivated lane folding (`yolox_tpu/ops/lane_fold.py`):
for small-channel stages padded bytes >> logical bytes, and on a
bandwidth-bound model the padding is pure wall-clock. Output per model:

  per-stage table (C, spatial, logical GB, padded GB, waste x)
  totals + implied HBM-roofline img/s at the bench batch size

Compare against the *measured* stage times from scripts/profile_serve.py
(real chip); docs/serving_performance.md reads both side by side.

Usage: python scripts/serve_traffic_model.py [--model nano] [--batch 256]
       [--lane-fold]
"""

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BYTES = 819e9  # v5e HBM
PEAK_FLOPS = 197e12  # v5e bf16 MXU


def padded_shape_bytes(shape, itemsize, lane=128):
    """Bytes of a tensor under TPU tiled layout (minor->lane, 2nd-minor->
    sublane). Sublane quantum is 8 rows of 4 bytes: 8 for f32, 16 for bf16."""
    if len(shape) == 0:
        return itemsize
    sub = 8 * (4 // itemsize)
    dims = list(shape)
    dims[-1] = -(-dims[-1] // lane) * lane
    if len(dims) >= 2:
        dims[-2] = -(-dims[-2] // sub) * sub
    n = 1
    for d in dims:
        n *= d
    return n * itemsize


def conv_census(model: str, batch: int, lane_fold: bool):
    import jax
    import jax.numpy as jnp

    from yolox_tpu import YoloxConfig, YoloxModule

    cfg = YoloxConfig.get_named_config(f"yolox_{model}")
    module = YoloxModule.from_config(cfg, dtype=jnp.bfloat16)
    size = cfg.test_size[0]
    x = jnp.zeros((batch, size, size, 3), jnp.bfloat16)

    def fwd(p, xin):
        if lane_fold:
            import dataclasses

            from yolox_tpu.models.blocks import EVAL_CTX

            ctx = dataclasses.replace(EVAL_CTX, lane_fold=True)
            fpn = module.backbone(p["backbone"], xin, ctx, "backbone")
        else:
            fpn = module.backbone(p["backbone"], xin)
        return module.head.forward_raw_levels(p["head"], fpn)

    params = module.cast_params(module.params, jnp.bfloat16)
    jaxpr = jax.make_jaxpr(fwd)(params, x)

    rows = defaultdict(lambda: [0, 0.0, 0.0, 0.0])  # key -> n, logical, padded, gflop
    tot_logical = tot_padded = tot_flop = 0.0
    for eqn in jaxpr.jaxpr.eqns:
        if eqn.primitive.name != "conv_general_dilated":
            continue
        a = eqn.invars[0].aval
        w = eqn.invars[1].aval
        o = eqn.outvars[0].aval
        it = a.dtype.itemsize
        logical = (a.size + o.size) * it
        padded = padded_shape_bytes(a.shape, it) + padded_shape_bytes(o.shape, it)
        groups = eqn.params.get("feature_group_count", 1)
        kh, kw = w.shape[0], w.shape[1]
        flop = 2.0 * o.size * kh * kw * (a.shape[-1] // groups)
        key = (a.shape[-1], o.shape[-1], a.shape[1], groups > 1)
        r = rows[key]
        r[0] += 1
        r[1] += logical
        r[2] += padded
        r[3] += flop
        tot_logical += logical
        tot_padded += padded
        tot_flop += flop
    return rows, tot_logical, tot_padded, tot_flop, size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="nano")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--lane-fold", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from bench import SERVE_BATCH

    batch = args.batch or SERVE_BATCH[args.model]
    rows, logical, padded, flop, size = conv_census(
        args.model, batch, args.lane_fold)

    print(f"# yolox-{args.model} serving forward, {size}px batch {batch}"
          f"{' (lane-folded)' if args.lane_fold else ''}")
    print(f"{'Cin->Cout':>12} {'spat':>5} {'dw':>3} {'n':>3} "
          f"{'logical GB':>11} {'padded GB':>10} {'waste':>6}")
    for (cin, cout, sp, dw), (n, lg, pd, fl) in sorted(
            rows.items(), key=lambda kv: -kv[1][2]):
        print(f"{cin:>6}->{cout:<5} {sp:>5} {'dw' if dw else '':>3} {n:>3} "
              f"{lg / 1e9:>11.3f} {pd / 1e9:>10.3f} {pd / lg:>5.1f}x")
    print(f"\ntotals: logical {logical / 1e9:.2f} GB, padded "
          f"{padded / 1e9:.2f} GB ({padded / logical:.2f}x), "
          f"{flop / 1e12:.2f} TFLOP")
    print(f"HBM roofline:  logical {batch / (logical / PEAK_BYTES):.0f} img/s, "
          f"padded {batch / (padded / PEAK_BYTES):.0f} img/s")
    print(f"MXU roofline:  {batch / (flop / PEAK_FLOPS):.0f} img/s")


if __name__ == "__main__":
    main()
