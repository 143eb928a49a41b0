#!/usr/bin/env python
"""Aggregate a jax.profiler trace into a per-op device-time table.

Usage: python scripts/trace_report.py <trace_dir> [--top 25] [--iters N]

Reads the perfetto trace(s) under <trace_dir>/plugins/profile/*/
*.trace.json.gz, keeps events on TPU device tracks (pid whose process
name contains "TPU" and not "Host"), and prints total device time per
op name, descending. With --iters, also prints us/iter. Device-free
(pure json parsing) — companion to `scripts/profile_serve.py --trace`.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def load_events(trace_dir: str):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        paths = sorted(glob.glob(os.path.join(trace_dir,
                                              "*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    events = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            events.extend(json.load(f).get("traceEvents", []))
    return events


def device_pids(events):
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e.get("args", {}).get("name", "")
    return {pid for pid, n in names.items()
            if ("TPU" in n or "device" in n.lower()) and "Host" not in n
            and "host" not in n}, names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--iters", type=int, default=None)
    args = ap.parse_args()

    events = load_events(args.trace_dir)
    pids, names = device_pids(events)
    per_op = collections.Counter()
    total = 0.0
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in pids
                and "dur" in e):
            per_op[e.get("name", "?")] += e["dur"]
            total += e["dur"]
    print(f"device tracks: {[names[p] for p in sorted(pids)]}")
    print(f"total device op time: {total / 1e3:.3f} ms"
          + (f"  ({total / args.iters:.1f} us/iter)"
             if args.iters else ""))
    width = max((len(n) for n, _ in per_op.most_common(args.top)),
                default=10)
    for name, dur in per_op.most_common(args.top):
        line = f"{name:<{width}}  {dur / 1e3:9.3f} ms  {100 * dur / total:5.1f}%"
        if args.iters:
            line += f"  {dur / args.iters:8.1f} us/iter"
        print(line)


if __name__ == "__main__":
    main()
