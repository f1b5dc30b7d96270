"""Aggregate a jax.profiler chrome trace by HLO op: total device time per
op name and per coarse category (gather / scatter / conv / dot / sort /
fusion / copy / other).

Usage: python experiments/trace_agg.py [/tmp/jax_trace] [--top 40]
Reads the newest plugins/profile/*/**.trace.json.gz under the trace dir.
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def newest_trace(root):
    paths = glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        sys.exit(f"no *.trace.json.gz under {root}")
    return max(paths, key=os.path.getmtime)


def categorize(name: str) -> str:
    n = name.lower()
    for pat, cat in (
        (r"gather", "gather"), (r"scatter", "scatter"),
        (r"conv", "conv"), (r"dot|matmul|gemm", "dot"),
        (r"sort", "sort"), (r"reduce", "reduce"),
        (r"copy|transpose|reshape|bitcast", "copy"),
        (r"fusion|loop_|input_", "fusion"),
        (r"all_reduce|all_gather|collective|permute", "collective"),
        (r"dynamic", "dynamic-slice/update"),
        (r"infeed|outfeed|host", "host-transfer"),
    ):
        if re.search(pat, n):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", nargs="?", default="/tmp/jax_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    path = newest_trace(args.root)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # device lanes: process_name metadata containing 'TPU' (or 'Device')
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if "TPU" in pname or "Device" in pname or "/device:" in pname:
                dev_pids.add(e["pid"])

    by_name = collections.Counter()
    by_cat = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # µs
        by_name[name] += dur
        by_cat[categorize(name)] += dur
        total += dur

    print(f"trace: {path}")
    print(f"total device op time: {total/1e3:.1f} ms "
          f"(sum over lanes; divide by traced reps)")
    print("\n== by category ==")
    for cat, dur in by_cat.most_common():
        print(f"  {cat:22s} {dur/1e3:9.2f} ms  {100*dur/max(total,1e-9):5.1f}%")
    print(f"\n== top {args.top} ops ==")
    for name, dur in by_name.most_common(args.top):
        print(f"  {dur/1e3:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
