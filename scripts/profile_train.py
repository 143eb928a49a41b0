#!/usr/bin/env python
"""Capture a jax.profiler trace of the training step on the real chip.

Usage:
  python scripts/profile_train.py [--model s] [--batch 64] [--steps 5]
      [--outdir /tmp/yolox_trace]

Produces a TensorBoard-compatible trace under --outdir and prints a
coarse wall-clock breakdown (fwd-only vs fwd+loss vs full step) so the
fwd:step ratio can be attributed without the trace viewer.
"""

import argparse
import time

import numpy as np


def timed(fn, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="s")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--outdir", default="/tmp/yolox_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from yolox_tpu import YoloxConfig, YoloxModule
    from yolox_tpu.core import init_train_state, make_train_step
    from yolox_tpu.models.assign import compute_losses

    cfg = YoloxConfig.get_named_config(f"yolox_{args.model}")
    module = YoloxModule.from_config(cfg, dtype=jnp.float32)
    size = cfg.input_size[0]
    b = args.batch

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (b, size, size, 3)), jnp.float32)
    labels = np.zeros((b, 10, 5), np.float32)
    labels[:, 0] = [1, size / 2, size / 2, size / 3, size / 3]
    labels[:, 1] = [5, size / 4, size / 4, size / 4, size / 5]
    labels = jnp.asarray(labels)
    lr = jnp.float32(0.01)

    step = make_train_step(module, cfg.num_classes,
                           compute_dtype=jnp.bfloat16)
    state = init_train_state(module.params)

    # ---- coarse decomposition (separate jitted programs) ----
    from yolox_tpu.models.blocks import BNCollector

    def fwd_infer(p, xin):
        fpn = module.backbone(p["backbone"], xin.astype(jnp.bfloat16))
        return module.head(p["head"], fpn)

    def fwd_train(p, xin):
        collector = BNCollector()
        out = module.apply_train(p, xin.astype(jnp.bfloat16), collector)
        return out["outputs"].astype(jnp.float32).sum()

    def fwd_loss(p, xin, lab):
        collector = BNCollector()
        out = module.apply_train(p, xin.astype(jnp.bfloat16), collector)
        return compute_losses(out, lab, cfg.num_classes)["total_loss"]

    def fwd_loss_grad(p, xin, lab):
        return jax.value_and_grad(
            lambda q: fwd_loss(q, xin, lab))(p)[0]

    jf_infer = jax.jit(fwd_infer)
    jf_train = jax.jit(fwd_train)
    jf_loss = jax.jit(fwd_loss)
    jf_grad = jax.jit(fwd_loss_grad)

    params = module.params

    def sync(v):
        jax.block_until_ready(v)

    rows = []

    def bench(tag, fn):
        sync(fn())  # compile
        dt = timed(lambda: sync(fn())) / 1.0
        rows.append((tag, dt * 1000, b / dt))
        print(f"{tag:34s} {dt*1000:9.2f} ms  {b/dt:9.1f} img/s")

    bench("fwd eval-mode (bf16)", lambda: jf_infer(params, x))
    bench("fwd train-mode (BN batch stats)", lambda: jf_train(params, x))
    bench("fwd + SimOTA loss", lambda: jf_loss(params, x, labels))
    bench("fwd + loss + grad", lambda: jf_grad(params, x, labels))

    # full step: donated, chain iters sequentially
    st = init_train_state(module.params)
    st, m = step(st, x, labels, lr)
    sync(m["total_loss"])

    def full():
        nonlocal st
        for i in range(args.iters):
            st, m = step(st, x, labels, lr)
        sync(m["total_loss"])

    dt = timed(full, repeats=2) / args.iters
    rows.append(("full train step", dt * 1000, b / dt))
    print(f"{'full train step':34s} {dt*1000:9.2f} ms  {b/dt:9.1f} img/s")

    # ---- profiler trace of the full step ----
    with jax.profiler.trace(args.outdir):
        for i in range(args.steps):
            st, m = step(st, x, labels, lr)
        sync(m["total_loss"])
    print(f"\ntrace written to {args.outdir}")


if __name__ == "__main__":
    main()
