#!/usr/bin/env python
"""Benchmark harness: every README performance row is regenerable here.

Default invocation (`python bench.py`, what the driver runs) prints the
headline: yolox-s batched 640px serving throughput on one TPU chip, ONE
JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Matrix coverage (one JSON line per invocation):
  python bench.py --model s|m|l|x|nano|tiny|yolov3 --mode serve      [--batch N]
  python bench.py --model s --mode serve [--int8]             # int8 PTQ
  python bench.py --model s --mode serve-b1                   # ms/image
  python bench.py --model s --mode fwd                        # fwd only
  python bench.py --model s|l|x --mode train [--remat]        # train step
  python bench.py --model s --mode train-aug                  # + on-device
                                                              #   augmentation

Baseline: the reference publishes V100 batch-1 fp16 latency incl. NMS
(docs/model_zoo.md: s 9.8 ms, m 12.3, l 14.5, x 17.3). vs_baseline for the
serve modes is ours vs that anchor (images/sec ratio, or latency ratio for
serve-b1); train/fwd modes have no published reference number -> null.

Methodology (serve/fwd): the measured region is a single jitted graph that
runs `iters` steps in a lax.fori_loop, each step's input perturbed by the
loop counter (prevents XLA from hoisting loop-invariant work) and each
step's result folded into a scalar checksum (prevents dead-code elimination
and forces sequential execution). One scalar is fetched at the end. This is
robust to the async-dispatch/`block_until_ready` unreliability of tunneled
TPU attachments, where wall-clocking per-call dispatch is meaningless.

Methodology (train modes): the training step donates its state, so chained
host dispatches are sequentially dependent; the loss fetch after `iters`
steps is the completion barrier.
"""

import argparse
import json
import time

import numpy as np

# reference V100 anchors, images/sec = 1000 / published ms
# (docs/model_zoo.md:7-11, batch-1 fp16 incl. NMS)
V100_MS = {"s": 9.8, "m": 12.3, "l": 14.5, "x": 17.3, "yolov3": 11.1}

# per-model serve batches from the round-4 on-chip sweep: s 256 (384/512
# lose 4-5%), m 128 (192 gains +2.3% bf16 but costs -21% int8-hbm; 256
# falls off a memory cliff), l 96 (+9% bf16 AND +11% int8-hbm over 64),
# x 32 (48 is flat), details in docs/serving_performance.md
SERVE_BATCH = {"nano": 256, "tiny": 256, "s": 256, "m": 128, "l": 96,
               "x": 32, "yolov3": 64}
TRAIN_BATCH = {"nano": 64, "tiny": 64, "s": 64, "m": 48, "l": 32, "x": 16,
               "yolov3": 24}


def _model(name, dtype, mutate=None):
    from yolox_tpu import YoloxConfig, YoloxModule

    registry_name = name if name == "yolov3" else f"yolox_{name}"
    cfg = YoloxConfig.get_named_config(registry_name)
    if mutate is not None:
        mutate(cfg)
    return YoloxModule.from_config(cfg, dtype=dtype), cfg


def _disp(name):
    """Metric display name ("yolox_s", but "yolov3" stays bare)."""
    return name if name == "yolov3" else f"yolox_{name}"


def _timed_loop(step_fn, params, x, iters, checksum_of):
    """Jitted graph of `iters` sequential steps; see module docstring."""
    import jax
    import jax.numpy as jnp

    def run(p, x0):
        def body(i, checksum):
            xi = x0 + checksum * 1e-12 + jnp.float32(i) * 1e-6
            out = step_fn(p, xi)
            return checksum_of(out) + checksum * 0.5

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    return jax.jit(run)


def _best_of(fn, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _toy_labels(batch, size, n=10):
    labels = np.zeros((batch, n, 5), np.float32)
    labels[:, 0] = [1, size / 2, size / 2, size / 3, size / 3]
    labels[:, 1] = [5, size / 4, size / 4, size / 4, size / 5]
    return labels


def bench_serve(name, batch, iters, batch1=False, int8=False,
                int8_hbm=False, stem_s2d=None):
    import jax.numpy as jnp

    module, cfg = _model(name, jnp.bfloat16)
    size = cfg.test_size[0]
    if batch1:
        batch, iters = 1, max(iters, 128)

    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (batch, size, size, 3)), jnp.float32)
    qtab = (module.calibrate_int8(module.params, x)
            if (int8 or int8_hbm) else None)

    def serve(p, x):
        return module.serve(p, x, conf_thre=0.5, nms_thre=cfg.nmsthre,
                            class_agnostic=False, max_det=256,
                            int8_qtab=qtab if int8 else None,
                            int8_hbm_qtab=qtab if int8_hbm else None,
                            stem_s2d=stem_s2d)
    run = _timed_loop(serve, module.params, x, iters,
                      lambda out: jnp.sum(out[0][:, 0, 0]))
    np.asarray(run(module.params, x))          # compile + warmup
    dt = _best_of(lambda: np.asarray(run(module.params, x)))

    anchor = V100_MS.get(name)
    prec = "int8-hbm" if int8_hbm else ("int8" if int8 else "bf16")
    if batch1:
        ms = 1000 * dt / iters
        return {
            "metric": f"{_disp(name)} {size}px batch-1 serving latency "
                      f"incl. NMS ({prec})",
            "value": round(ms, 3),
            "unit": "ms/image",
            "vs_baseline": round(anchor / ms, 3) if anchor else None,
        }
    ips = batch * iters / dt
    return {
        "metric": f"{_disp(name)} {size}px batched serving incl. NMS "
                  f"({prec}, batch {batch})",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": (round(ips / (1000 / anchor), 3) if anchor
                        else None),
    }


def bench_fwd(name, batch, iters):
    import jax.numpy as jnp

    module, cfg = _model(name, jnp.bfloat16)
    size = cfg.test_size[0]

    def fwd(p, x):
        fpn = module.backbone(p["backbone"], x.astype(jnp.bfloat16))
        return module.head(p["head"], fpn)

    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (batch, size, size, 3)), jnp.float32)
    run = _timed_loop(fwd, module.params, x, iters,
                      lambda out: jnp.sum(out[:, 0, :4].astype(jnp.float32)))
    np.asarray(run(module.params, x))
    dt = _best_of(lambda: np.asarray(run(module.params, x)))
    return {
        "metric": f"{_disp(name)} {size}px forward only "
                  f"(bf16, batch {batch})",
        "value": round(batch * iters / dt, 2),
        "unit": "images/sec/chip",
        "vs_baseline": None,
    }


def bench_train(name, batch, iters, remat=False, device_aug=False,
                pipelined=False, stem_s2d=False):
    import jax
    import jax.numpy as jnp

    from yolox_tpu.core import init_train_state, make_train_step

    # s2d A/B leg: the fold is mutually exclusive with lane folding at
    # the stem, so that leg builds the backbone unfolded — the
    # comparison is (lane-fold default) vs (plain + s2d stem);
    # docs/train_step_performance.md "stem_s2d on the train step"
    module, cfg = _model(
        name, jnp.float32,                        # f32 master weights
        mutate=((lambda c: setattr(c, "lane_fold", False))
                if stem_s2d else None))
    size = cfg.input_size[0]
    step = make_train_step(module, cfg.num_classes,
                           compute_dtype=jnp.bfloat16, remat=remat,
                           stem_s2d=stem_s2d)
    state = init_train_state(module.params)
    rng = np.random.default_rng(0)
    # Trainer-consistent linear lr scaling (basic_lr_per_img * batch,
    # config.py:61): a flat 0.01 matches the b64 models but over-drives
    # the smaller-batch deep models 1.3-4x — enough that yolox-x (b16)
    # diverges to NaN within the 17-step measured window at cold-start
    # random init. Timing is lr-independent; the finite-loss assert is
    # only meaningful under the lr rule real training uses.
    lr = jnp.float32(0.01 / 64.0 * batch)

    if device_aug:
        from yolox_tpu.core import (
            make_augmented_train_step,
            make_pipelined_train_step,
        )

        tiles = jnp.asarray(rng.integers(
            0, 255, (batch, 5, size, size, 3), dtype=np.uint8))
        hw = jnp.full((batch, 5, 2), float(size), jnp.float32)
        raw_labels = jnp.asarray(
            np.tile(_toy_labels(batch, size, 8)[:, None], (1, 5, 1, 1)))
        key = jax.random.PRNGKey(0)

        if pipelined:
            prime, step_pipe = make_pipelined_train_step(
                module, cfg.num_classes, compute_dtype=jnp.bfloat16,
                remat=remat)
            carried = prime(tiles, hw, raw_labels, key, (size, size))

            def one_iter(state, i):
                nonlocal carried
                state, m, *carried = step_pipe(
                    state, *carried, tiles, hw, raw_labels,
                    jax.random.fold_in(key, i), lr, (size, size))
                return state, m
        else:
            step_aug = make_augmented_train_step(
                module, cfg.num_classes, compute_dtype=jnp.bfloat16,
                remat=remat)

            def one_iter(state, i):
                return step_aug(state, tiles, hw, raw_labels,
                                jax.random.fold_in(key, i), lr,
                                (size, size))
    else:
        x = jnp.asarray(rng.uniform(0, 255, (batch, size, size, 3)),
                        jnp.float32)
        labels = jnp.asarray(_toy_labels(batch, size))

        # Chain calls on the AOT-compiled executable. No per-iter input
        # perturbation: unlike the serve modes' single fori_loop graph
        # (where unperturbed iterations could be hoisted/DCE'd — and
        # which, for this program, exceeds the tunneled compile
        # endpoint's request size limit), separate executable calls
        # cannot be cross-optimized, and the donated state already makes
        # them sequentially dependent. The old `x + i*1e-6` perturbation
        # was a separate dispatched device pass over the 314 MB input —
        # ~8 ms/step of pure measurement overhead.
        step_exe = step.lower(state, x, labels, lr).compile()

        def one_iter(state, i):
            return step_exe(state, x, labels, lr)

    state, m = one_iter(state, 0)              # compile + warmup
    float(np.asarray(m["total_loss"]))

    def run():
        nonlocal state
        for i in range(iters):
            state, m = one_iter(state, i + 1)
        assert np.isfinite(float(np.asarray(m["total_loss"])))

    dt = _best_of(run, repeats=2)
    tag = " incl. on-device augmentation" if device_aug else ""
    tag += " (pipelined)" if pipelined else ""
    tag += ", remat" if remat else ""
    tag += ", s2d stem (no lane fold)" if stem_s2d else ""
    return {
        "metric": f"{_disp(name)} {size}px training step{tag} "
                  f"(bf16, batch {batch})",
        "value": round(batch * iters / dt, 2),
        "unit": "images/sec/chip",
        "vs_baseline": None,
    }


# the full README benchmark matrix: (model, mode, remat, int8) per row,
# in README order — `--all` regenerates every row as one JSON line each
README_ROWS = [
    ("nano", "serve", False, False), ("tiny", "serve", False, False),
    ("tiny", "serve", False, "hbm"),
    ("s", "serve", False, False), ("s", "serve", False, "hbm"),
    ("s", "serve-b1", False, False),
    ("m", "serve", False, False), ("m", "serve", False, "hbm"),
    ("m", "serve-b1", False, False),
    ("l", "serve", False, False), ("l", "serve", False, "hbm"),
    ("l", "serve-b1", False, False),
    ("x", "serve", False, False), ("x", "serve", False, "hbm"),
    ("x", "serve-b1", False, False),
    ("s", "fwd", False, False),
    ("nano", "train", False, False), ("tiny", "train", False, False),
    ("s", "train", False, False), ("s", "train-aug", False, False),
    ("m", "train", False, False), ("l", "train", False, False),
    ("x", "train", True, False),
    ("yolov3", "serve", False, False),
    ("yolov3", "serve", False, "hbm"),
    ("yolov3", "serve-b1", False, False),
    ("yolov3", "train", False, False),
]


# per-mode asymptotic iteration counts: enough chained repetitions that
# the fixed per-measurement cost (final fetch + sync, ~300 ms through a
# tunneled attachment) is amortized below the run-to-run noise floor.
# serve-b1 raises its own floor to 128 inside bench_serve.
DEFAULT_ITERS = {"serve": 32, "serve-b1": 128, "fwd": 32,
                 "train": 16, "train-aug": 16}


def run_one(model, mode, batch, iters, remat, int8=False, int8_hbm=False,
            pipelined=False, stem_s2d=None):
    if iters is None:
        iters = DEFAULT_ITERS[mode]
    if mode == "serve":
        out = bench_serve(model, batch or SERVE_BATCH[model], iters,
                          int8=int8, int8_hbm=int8_hbm, stem_s2d=stem_s2d)
        if (model == "s" and batch is None and not (int8 or int8_hbm)
                and stem_s2d is None):
            # keep the driver headline metric name stable (only for the
            # true default configuration — a forced --stem-s2d leg must
            # not masquerade as the headline)
            out["metric"] = ("yolox_s 640px batched inference incl. NMS "
                             "(bf16)")
    elif mode == "serve-b1":
        out = bench_serve(model, 1, iters, batch1=True, int8=int8,
                          int8_hbm=int8_hbm, stem_s2d=stem_s2d)
    elif mode == "fwd":
        out = bench_fwd(model, batch or SERVE_BATCH[model], iters)
    elif mode == "train":
        out = bench_train(model, batch or TRAIN_BATCH[model], iters,
                          remat=remat, stem_s2d=(stem_s2d is True))
    else:
        out = bench_train(model, batch or TRAIN_BATCH[model], iters,
                          device_aug=True, pipelined=pipelined)
    return out


def _enable_compile_cache():
    """Persistent XLA compile cache: a full --all matrix is ~20 programs
    at 2-15 min of LLVM codegen each on this class of host; repeat rows
    (and re-runs after harness-only edits — lr/iters are runtime args,
    so the HLO is unchanged) become cache hits. Measurement is
    unaffected: every mode compiles+warms up before the timed window.
    Honors an explicit JAX_COMPILATION_CACHE_DIR."""
    import os

    import jax

    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "out", "xla_cache_bench")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="s",
                    choices=["nano", "tiny", "s", "m", "l", "x", "yolov3"])
    ap.add_argument("--mode", default="serve",
                    choices=["serve", "serve-b1", "fwd", "train",
                             "train-aug"])
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None,
                    help="chained repetitions; default per mode "
                         "(DEFAULT_ITERS)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="serve modes: post-training int8 quantized "
                         "forward (calibrated on the bench batch; "
                         "yolox_tpu/ops/quant.py)")
    ap.add_argument("--int8-hbm", action="store_true",
                    help="serve modes: int8-activations-in-HBM PTQ "
                         "(QTensor block interface; halves inter-block "
                         "HBM bytes — the light-model lever)")
    ap.add_argument("--stem-s2d", default=None, choices=["on", "off"],
                    help="serve modes: force the space-to-depth stem fold "
                         "on/off (default: the config's batch-conditional "
                         "policy; ops/stem_s2d.py)")
    ap.add_argument("--pipelined", action="store_true",
                    help="train-aug: software-pipelined variant (step n "
                         "+ augment n+1 in one program; "
                         "core/train_step.py:make_pipelined_train_step)")
    ap.add_argument("--all", action="store_true",
                    help="run every README benchmark row (one JSON line "
                         "each; expect long compiles for l/x)")
    args = ap.parse_args()
    _enable_compile_cache()

    if args.all:
        for model, mode, remat, int8 in README_ROWS:
            out = run_one(model, mode, None, args.iters, remat,
                          int8=(int8 is True), int8_hbm=(int8 == "hbm"))
            print(json.dumps(out), flush=True)
        return

    stem = {None: None, "on": True, "off": False}[args.stem_s2d]
    out = run_one(args.model, args.mode, args.batch, args.iters, args.remat,
                  int8=args.int8, int8_hbm=args.int8_hbm,
                  pipelined=args.pipelined, stem_s2d=stem)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
