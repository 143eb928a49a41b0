#!/usr/bin/env python
"""Device-augment engine breakdown on the real chip: where do the ms go?

Times the full `device_augment_batch` as one jitted graph of `iters`
checksum-chained repetitions (same methodology as profile_train.py), then
captures a jax.profiler trace and prints per-op device totals attributed
to source lines, so each engine stage's cost is a printed fact.

Usage:
  python scripts/profile_augment.py [--batch 64] [--iters 8]
      [--trace /tmp/aug_trace] [--top 25]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--trace", default="/tmp/aug_trace")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from yolox_tpu.data.device_augment import device_augment_batch

    b, size, iters = args.batch, args.size, args.iters
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.integers(
        0, 255, (b, 5, size, size, 3), dtype=np.uint8))
    hw = jnp.full((b, 5, 2), float(size), jnp.float32)
    lab = np.zeros((b, 5, 60, 5), np.float32)
    lab[:, :, :8, :4] = rng.uniform(10, size - 10, (b, 5, 8, 4))
    lab[:, :, :8, 2:4] += 32
    labels = jnp.asarray(lab)
    key = jax.random.PRNGKey(0)

    def one(t, h, l, i):
        imgs, packed = device_augment_batch(
            t, h, l, jax.random.fold_in(key, i), out_size=(size, size))
        return (jnp.sum(imgs[:, 0, 0, 0].astype(jnp.float32))
                + jnp.sum(packed[:, 0, 1].astype(jnp.float32)))

    @jax.jit
    def run(t, h, l):
        def body(i, checksum):
            return checksum * 0.5 + one(t, h, l, i)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    def run_np():
        return np.asarray(run(tiles, hw, labels))

    run_np()  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run_np()
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    print(f"full engine: {dt * 1000:8.3f} ms/batch "
          f"({b / dt:9.1f} img/s of augmentation)")

    with jax.profiler.trace(args.trace):
        run_np()

    # ---- parse the device trace: per-op totals, source-attributed ----
    paths = glob.glob(os.path.join(
        args.trace, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace found", file=sys.stderr)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device pid: the one whose thread names mention TensorCore/XLA Ops
    op_pids = set()
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and "XLA Ops" in str(e.get("args", {}).get("name", ""))):
            op_pids.add(e["pid"])
    totals = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in op_pids:
            continue
        name = e.get("name", "")
        if name.startswith(("tpu_program", "program")) or name.isdigit():
            continue
        totals[name] += e.get("dur", 0.0)
        counts[name] += 1
    total_us = sum(totals.values())
    print(f"\nper-op device totals over {iters} iters "
          f"(sum {total_us / 1000 / iters:.2f} ms/iter):")

    # map op name -> source metadata + shape from the compiled HLO text
    hlo = jax.jit(run).lower(tiles, hw, labels).compile().as_text()
    meta = {}
    for line in hlo.splitlines():
        ls = line.strip()
        if "metadata={" not in ls or "= " not in ls:
            continue
        try:
            opname = ls.split("= ", 1)[0].strip().lstrip("%")
            shape = ls.split("= ", 1)[1].split(" ", 1)[0]
            md = ls.split("metadata={", 1)[1]
            src = ""
            if "source_file=" in md:
                src = md.split('source_file="', 1)[1].split('"', 1)[0]
                src = "/".join(src.rsplit("/", 2)[-2:])
                if "source_line=" in md:
                    src += ":" + md.split("source_line=", 1)[1].split(
                        " ", 1)[0].rstrip("} ")
            op = ""
            if 'op_name="' in md:
                op = md.split('op_name="', 1)[1].split('"', 1)[0][-60:]
            meta[opname] = f"{shape}  {src}  {op}"
        except (IndexError, ValueError):
            continue
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:args.top]
    for name, us in rows:
        print(f"  {us / 1000 / iters:8.3f} ms  x{counts[name] // iters:<4d}"
              f" {name[:40]}  {meta.get(name, '')[:140]}")


if __name__ == "__main__":
    main()
