"""Summarize a jax.profiler trace without TensorBoard.

The reference has no profiling story at all (SURVEY.md §5: wall-clock
seconds per step only); the rebuild captures device traces via
``TrainConfig.profile_dir`` / ``jax.profiler.trace``.  This tool digests the
resulting ``*.trace.json.gz`` (the Chrome-trace export JAX writes next to
the xplane proto) into a per-op time table so hotspots are visible from a
terminal.

Usage:
    python tools/trace_summary.py /path/to/trace_dir_or_json.gz [--steps N]
                                  [--top K] [--line "XLA Ops"]

Notes on reading the output: ops inside a ``lax.scan`` appear once per
micro step (the scan itself shows as ``while.N`` covering its children, so
the while row double-counts them); ``select_add_fusion`` rows are typically
relu/pool backwards, ``convert_reduce_fusion`` float32 batch-norm moment
reductions around bfloat16 activations.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(
        path, "**", "*.trace.json.gz"), recursive=True))
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {path}")
    return hits[-1]  # newest capture


def load_events(path: str):
    with gzip.open(path) as f:
        return json.load(f)["traceEvents"]


def summarize(events, line: str = "XLA Ops", device_only: bool = True):
    """Returns (rows, total_us, device_names): rows = [(name, us, count)]."""
    pids, tids = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {p for p, n in pids.items()
                   if not device_only or "/device:" in n}
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        if tids.get((e["pid"], e.get("tid")), "") != line:
            continue
        agg[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
    rows = [(n, us, cnt[n]) for n, us in agg.most_common()]
    return rows, sum(agg.values()), [pids[p] for p in device_pids]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", help="trace dir (searched recursively) or "
                                  "*.trace.json.gz file")
    ap.add_argument("--steps", type=int, default=1,
                    help="number of profiled steps (durations are divided "
                         "by this to report per-step ms)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--line", default="XLA Ops",
                    help='trace line to aggregate (e.g. "XLA Ops", '
                         '"Steps", "XLA Modules")')
    args = ap.parse_args(argv)

    path = find_trace(args.trace)
    rows, total, devices = summarize(load_events(path), args.line)
    print(f"# {path}")
    print(f"# devices: {devices};  line: {args.line};  "
          f"total {total / args.steps / 1000:.2f} ms/step")
    print(f"{'ms/step':>9}  {'%':>5}  {'calls':>6}  op")
    for name, us, n in rows[:args.top]:
        print(f"{us / args.steps / 1000:9.3f}  {100 * us / total:5.1f}  "
              f"{n // args.steps:6d}  {name[:100]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
