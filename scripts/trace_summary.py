"""Summarize a jax.profiler trace: aggregate device kernel time by op name.

Finds the newest ``*.trace.json.gz`` under the given directory (default
``output/profile_bench``), filters to TPU device-track complete events, and
prints the top ops by total duration plus a bucketed rollup (matmul/conv,
gather/scatter, sort, custom-call, copy/relayout, elementwise-fusion).

Usage: python scripts/trace_summary.py [trace_dir] [--top 40] [--like chol]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(root):
    cands = sorted(
        glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not cands:
        sys.exit(f"no *.trace.json.gz under {root}")
    return cands[-1]


BUCKETS = [
    ("matmul/conv", re.compile(r"convolution|dot|matmul|einsum", re.I)),
    ("gather/scatter", re.compile(r"gather|scatter|dynamic-slice|dynamic_update", re.I)),
    ("sort/topk", re.compile(r"sort|top-k|topk", re.I)),
    ("custom-call", re.compile(r"custom-call|tpu_custom_call|pallas", re.I)),
    ("copy/relayout", re.compile(r"copy|transpose|relayout|bitcast", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("fusion/elementwise", re.compile(r"fusion|add|mul|select|broadcast|convert", re.I)),
]


def bucket_of(name):
    for label, pat in BUCKETS:
        if pat.search(name):
            return label
    return "other"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir", nargs="?", default="output/profile_bench")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--like", default=None, help="only ops whose name matches this regex")
    args = p.parse_args()

    path = find_trace(args.trace_dir)
    print(f"# {path}", file=sys.stderr)
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    events = data.get("traceEvents", [])
    # device tracks: pid whose process_name metadata mentions TPU/device XLA
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

    device_pids = {
        pid for pid, n in pid_name.items()
        if re.search(r"TPU|/device|GPU", n) and "Host" not in n
    }
    if not device_pids:  # fall back: everything except explicit host threads
        device_pids = set(pid_name) or {e.get("pid") for e in events}

    tot = collections.Counter()
    cnt = collections.Counter()
    span = [None, None]
    like = re.compile(args.like, re.I) if args.like else None
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_name.get((e.get("pid"), e.get("tid")), "")
        if "step" in tname.lower():  # XLA Op rollup lines, skip steps track
            pass
        name = e.get("name", "?")
        if like and not like.search(name):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        tot[name] += dur
        cnt[name] += 1
        t0, t1 = e.get("ts", 0), e.get("ts", 0) + e.get("dur", 0)
        span[0] = t0 if span[0] is None else min(span[0], t0)
        span[1] = t1 if span[1] is None else max(span[1], t1)

    total = sum(tot.values())
    wall = (span[1] - span[0]) / 1e3 if span[0] is not None else 0.0
    print(f"device busy {total:.1f} ms over {wall:.1f} ms span "
          f"({len(tot)} distinct ops)")
    buck = collections.Counter()
    for name, ms in tot.items():
        buck[bucket_of(name)] += ms
    for label, ms in buck.most_common():
        print(f"  {label:<22} {ms:9.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%")
    print()
    for name, ms in tot.most_common(args.top):
        print(f"{ms:9.2f} ms  x{cnt[name]:<6} {name[:140]}")


if __name__ == "__main__":
    main()
