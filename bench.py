#!/usr/bin/env python
"""Benchmark: yolox-s batched 640px inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline: the reference's published V100 latency for yolox-s is 9.8 ms
batch-1 fp16 including NMS (docs/model_zoo.md:7) = 102 images/sec/chip.
vs_baseline is ours / 102. (BASELINE.json's stated target is >2x
torch-on-A100 batched; no A100 number is published in the reference, so the
V100 figure is the recorded anchor.)

Methodology: the measured region is a single jitted graph that runs
`iters` serving steps in a lax.fori_loop, each step's input perturbed by the
loop counter (prevents XLA from hoisting loop-invariant work) and each
step's result folded into a scalar checksum (prevents dead-code elimination
and forces sequential execution). One scalar is fetched at the end. This is
robust to the async-dispatch/`block_until_ready` unreliability of tunneled
TPU attachments, where wall-clocking per-call dispatch is meaningless.

The serving step is the full path: NHWC forward (bf16 weights &
activations, f32 decode) + on-device confidence filter + class-aware NMS.
"""

import json
import time

import numpy as np


def build_serve(module, cfg, max_det=256):
    def serve(p, x):
        # fused path: bf16 forward + top-k select + f32 candidate decode
        # + fixpoint NMS, one XLA program (yolox_tpu/ops/nms.py)
        return module.serve(p, x, conf_thre=0.5, nms_thre=cfg.nmsthre,
                            class_agnostic=False, max_det=max_det)

    return serve


def timed_loop(serve, params, x, iters):
    """Returns a jitted fn running `iters` sequential serving steps."""
    import jax
    import jax.numpy as jnp

    def run(p, x0):
        def body(i, carry):
            checksum, _ = carry
            xi = x0 + checksum * 1e-12 + jnp.float32(i) * 1e-6
            dets, valid = serve(p, xi)
            checksum = jnp.sum(dets[:, 0, 0]) + checksum * 0.5
            return (checksum, jnp.sum(valid))

        return jax.lax.fori_loop(
            0, iters, body, (jnp.float32(0), jnp.int32(0)))

    return jax.jit(run)


def main():
    import jax
    import jax.numpy as jnp

    from yolox_tpu import YoloxConfig, YoloxModule

    cfg = YoloxConfig.get_named_config("yolox_s")
    module = YoloxModule.from_config(cfg, dtype=jnp.bfloat16)
    params = module.params

    batch = 256
    iters = 6
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (batch, 640, 640, 3)),
        jnp.float32)

    serve = build_serve(module, cfg)
    run = timed_loop(serve, params, x, iters)

    # Warmup / compile (scalar fetch = true completion barrier).
    np.asarray(run(params, x)[0])

    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        checksum = np.asarray(run(params, x)[0])
        best_dt = min(best_dt, time.perf_counter() - t0)

    ips = batch * iters / best_dt
    baseline = 102.0  # V100 batch-1 fp16 incl NMS (docs/model_zoo.md:7)
    print(json.dumps({
        "metric": "yolox_s 640px batched inference incl. NMS (bf16)",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / baseline, 3),
    }))


if __name__ == "__main__":
    main()
