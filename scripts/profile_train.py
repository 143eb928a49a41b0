#!/usr/bin/env python
"""Train-step breakdown on the real chip: where do the ms go?

Times each successive slice of the training step as ONE jitted graph of
`iters` chained repetitions (same checksum-chained fori_loop methodology
as bench.py — robust to the async-dispatch unreliability of tunneled TPU
attachments), then optionally writes a jax.profiler trace of the full
step for the TensorBoard viewer.

Usage:
  python scripts/profile_train.py [--model s] [--batch 64] [--iters 8]
      [--trace /tmp/yolox_trace]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="s")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from yolox_tpu import YoloxConfig, YoloxModule
    from yolox_tpu.core import init_train_state, make_train_step
    from yolox_tpu.models.assign import compute_losses
    from yolox_tpu.models.blocks import BNCollector
    from yolox_tpu.models.weights import merge_params, split_train_state

    cfg = YoloxConfig.get_named_config(f"yolox_{args.model}")
    module = YoloxModule.from_config(cfg, dtype=jnp.float32)
    size = cfg.input_size[0]
    b, iters = args.batch, args.iters

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (b, size, size, 3)), jnp.float32)
    labels = np.zeros((b, 10, 5), np.float32)
    labels[:, 0] = [1, size / 2, size / 2, size / 3, size / 3]
    labels[:, 1] = [5, size / 4, size / 4, size / 4, size / 5]
    labels = jnp.asarray(labels)
    lr = jnp.float32(0.01)

    trainable, stats = split_train_state(module.params)

    def fwd_eval(tr, xin):
        p = merge_params(tr, stats)
        fpn = module.backbone(p["backbone"], xin.astype(jnp.bfloat16))
        return module.head(p["head"], fpn)

    def fwd_train(tr, xin):
        p = merge_params(tr, stats)
        out = module.apply_train(p, xin.astype(jnp.bfloat16), BNCollector())
        return out["outputs"]

    def fwd_loss(tr, xin):
        p = merge_params(tr, stats)
        out = module.apply_train(p, xin.astype(jnp.bfloat16), BNCollector())
        return compute_losses(out, labels, cfg.num_classes)["total_loss"]

    def fwd_loss_grad(tr, xin):
        loss, grads = jax.value_and_grad(lambda q: fwd_loss(q, xin))(tr)
        # fold every grad leaf into the checksum so none is dead code
        return loss + sum(
            jnp.mean(g.astype(jnp.float32)) * 1e-20
            for g in jax.tree.leaves(grads))

    def chain(step_of_x):
        """iters sequential evaluations, each input perturbed by the
        running checksum so XLA cannot hoist or parallelize them."""
        def run(tr, x0):
            def body(i, checksum):
                xi = x0 + checksum * 1e-12 + jnp.float32(i) * 1e-6
                return checksum * 0.5 + step_of_x(tr, xi)

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
        np.asarray(run(trainable, x))  # compile + warmup
        dt = best_of(lambda: np.asarray(run(trainable, x))) / iters
        results.append({"stage": tag, "ms": round(dt * 1000, 2),
                        "img_per_s": round(b / dt, 1)})
        print(f"{tag:36s} {dt*1000:9.2f} ms  {b/dt:9.1f} img/s")

    csum_f32 = lambda out: jnp.sum(out[:, 0, :4].astype(jnp.float32))  # noqa

    bench("fwd eval-mode (bf16)",
          lambda tr, xi: csum_f32(fwd_eval(tr, xi)))
    bench("fwd train-mode (BN batch stats)",
          lambda tr, xi: csum_f32(fwd_train(tr, xi)))
    bench("fwd + SimOTA loss", fwd_loss)
    bench("fwd + loss + grad (bwd)", fwd_loss_grad)

    # full step (donated state; sequential by construction)
    step = make_train_step(module, cfg.num_classes,
                           compute_dtype=jnp.bfloat16)
    st = init_train_state(module.params)
    st, m = step(st, x, labels, lr)
    float(np.asarray(m["total_loss"]))

    def full():
        nonlocal st
        for i in range(iters):
            st, m = step(st, x, labels, lr)
        float(np.asarray(m["total_loss"]))

    dt = best_of(full, repeats=2) / iters
    results.append({"stage": "full train step", "ms": round(dt * 1000, 2),
                    "img_per_s": round(b / dt, 1)})
    print(f"{'full train step':36s} {dt*1000:9.2f} ms  {b/dt:9.1f} img/s")
    print(json.dumps(results))

    if args.trace:
        with jax.profiler.trace(args.trace):
            for i in range(3):
                st, m = step(st, x, labels, lr)
            float(np.asarray(m["total_loss"]))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
