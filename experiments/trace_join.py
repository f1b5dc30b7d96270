"""Join a jax.profiler trace with the compiled HLO's metadata: aggregate
device time by op_name module path (and by source file:line), so anonymous
`fusion.N` costs attribute to model components.

Usage:
  python experiments/trace_join.py /tmp/jax_trace_r3 /tmp/eval_hlo.txt \
      [--depth 4] [--top 40] [--lines]
The HLO text comes from `jitted.lower(...).compile().as_text()` of the SAME
program that was traced (same cache key => same op names).
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


def parse_hlo(path):
    """HLO op name -> (op_name metadata path, source file:line)."""
    meta = {}
    pat = re.compile(r"^\s*(?:ROOT )?%?([\w.\-]+) = ")
    for line in open(path):
        m = pat.match(line)
        if not m:
            continue
        op = m.group(1)
        mo = re.search(r'op_name="([^"]*)"', line)
        ms = re.search(r'source_file="([^"]*)" source_line=(\d+)', line)
        meta[op] = (
            mo.group(1) if mo else "?",
            f"{mo and os.path.basename(ms.group(1)) or '?'}:{ms.group(2)}"
            if ms else "?",
        )
    return meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_root")
    ap.add_argument("hlo")
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--lines", action="store_true")
    ap.add_argument("--reps", type=float, default=3.0,
                    help="traced reps to divide by")
    args = ap.parse_args()

    meta = parse_hlo(args.hlo)
    path = newest_trace(args.trace_root)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if "TPU" in pname or "Device" in pname or "/device:" in pname:
                dev_pids.add(e["pid"])

    by_mod = collections.Counter()
    by_line = collections.Counter()
    unattr = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        if name.startswith("jit_"):  # umbrella step event, double-counts
            continue
        total += dur
        if name in meta:
            opname, srcline = meta[name]
            parts = [p for p in opname.split("/") if p and "jit(" not in p]
            by_mod["/".join(parts[: args.depth])] += dur
            by_line[f"{srcline}  [{parts[-1] if parts else '?'}]"] += dur
        else:
            unattr[name] += dur

    r = args.reps
    print(f"trace: {path}")
    print(f"attributed device time: {total/1e3/r:.1f} ms/step "
          f"(reps={r:g}; unattributed {sum(unattr.values())/1e3/r:.1f} ms)")
    print(f"\n== by module (depth {args.depth}) ==")
    for mod, dur in by_mod.most_common(args.top):
        print(f"  {dur/1e3/r:8.2f} ms  {mod[:150]}")
    if args.lines:
        print("\n== by source line ==")
        for ln, dur in by_line.most_common(args.top):
            print(f"  {dur/1e3/r:8.2f} ms  {ln[:150]}")
    if unattr:
        print("\n== unattributed (top 10) ==")
        for name, dur in unattr.most_common(10):
            print(f"  {dur/1e3/r:8.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
