"""Aggregate a jax.profiler trace into per-op device-time totals.

    python tools/trace_report.py /tmp/parity_trace [--top 40] [--frames 5]

Reads the perfetto trace.json.gz that jax.profiler.trace writes and sums
durations of device-lane events (XLA fusions, custom calls) by op name.
This is the ground-truth decomposition of the production module — unlike
toggle-delta sweeps, it cannot be skewed by XLA choosing different fusions
per config.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_events(outdir):
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {outdir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--frames", type=int, default=5,
                    help="divide totals by this to get per-frame ms")
    ap.add_argument("--filter", default=None, help="regex on op name")
    ap.add_argument(
        "--by-source", action="store_true",
        help="aggregate by XLA op source attribution (repo file:line) "
        "instead of op name — the per-module decomposition",
    )
    args = ap.parse_args()

    events = load_events(args.outdir)
    # Device lanes: process names containing 'TPU' / 'Device'; keep complete
    # events (ph == 'X') that look like XLA ops (have a duration).
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    device_pids = {
        pid for pid, name in pid_names.items()
        if re.search(r"TPU|Device|/device", name, re.I)
    }

    totals = collections.Counter()
    counts = collections.Counter()
    lane_totals = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if e["pid"] not in device_pids:
            continue
        lane = tid_names.get((e["pid"], e["tid"]), str(e["tid"]))
        # Skip host-side launch lanes that mirror device events.
        if re.search(r"launch|host", lane, re.I):
            continue
        name = e["name"]
        if args.filter and not re.search(args.filter, name):
            continue
        if args.by_source:
            if name.startswith("jit_"):  # umbrella module event
                lane_totals[lane] += e["dur"]
                continue
            if lane != "XLA Ops":
                continue
            a = e.get("args", {})
            src = a.get("source") or ("<nosrc>:" + a.get("hlo_category", "?"))
            name = src.replace("/root/repo/androidrenderer_tpu/", "")
        totals[name] += e["dur"]
        counts[name] += 1
        lane_totals[lane] += e["dur"]

    print("== lanes ==")
    for lane, us in lane_totals.most_common(8):
        print(f"  {lane:40s} {us / 1e3 / args.frames:9.3f} ms/frame")
    print(f"== top {args.top} ops (of {len(totals)}) ==")
    grand = sum(totals.values())
    for name, us in totals.most_common(args.top):
        print(
            f"{us / 1e3 / args.frames:9.3f} ms/frame  x{counts[name]:<4d}"
            f" {100.0 * us / grand:5.1f}%  {name[:110]}"
        )
    print(f"total device time: {grand / 1e3 / args.frames:.2f} ms/frame")


if __name__ == "__main__":
    main()
