"""Join a jax.profiler trace with an XLA HLO dump to attribute device time
to SOURCE locations.

    XLA_FLAGS="--xla_dump_to=/tmp/hlo_parity --xla_dump_hlo_as_text" \
        python tools/trace_parity.py --outdir /tmp/ptrace
    python tools/trace_attrib.py /tmp/ptrace /tmp/hlo_parity [--top 40]

The trace's device-lane op names (fusion.24, while.62, custom-call _unknown_.9)
match instruction names in the *after-optimizations* HLO text; each fused
computation's instructions carry metadata op_name="jit(frame)/..." and
source_file/source_line. This prints per-op totals annotated with the most
common source lines inside the op — the ground-truth "which Python line costs
what" view that tools/trace_report.py (names only) cannot give.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_trace_totals(outdir, frames):
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {outdir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
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
    for e in events:
        if e.get("ph") != "X" or "dur" not in e or e["pid"] not in device_pids:
            continue
        lane = tid_names.get((e["pid"], e["tid"]), str(e["tid"]))
        if re.search(r"launch|host|module", lane, re.I):
            continue
        # Skip whole-module envelope events (they double-count children).
        if e["name"].startswith("jit_"):
            continue
        totals[e["name"]] += e["dur"] / 1e3 / frames  # ms/frame
    return totals


def load_hlo_ops(dumpdir):
    """op base name -> Counter of 'source_file:line (op_name tail)' strings."""
    paths = glob.glob(os.path.join(dumpdir, "*after_optimizations*.txt"))
    if not paths:
        paths = glob.glob(os.path.join(dumpdir, "**", "*after_optimizations*.txt"),
                          recursive=True)
    if not paths:
        raise SystemExit(f"no after_optimizations HLO text under {dumpdir}")
    # Pick the biggest module (the frame function).
    path = max(paths, key=os.path.getsize)
    print(f"# HLO: {path}")
    ops = {}  # fused computation name -> Counter(source)
    comp_of_op = {}  # top-level instruction name -> computation called
    cur_comp = None
    inst_re = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=")
    meta_re = re.compile(
        r'metadata=\{([^}]*)\}')
    opname_re = re.compile(r'op_name="([^"]*)"')
    src_re = re.compile(r'source_file="([^"]*)"(?:.*?source_line=(\d+))?')
    calls_re = re.compile(r'(?:calls|to_apply|body)=%?([\w.\-]+)')
    with open(path) as f:
        for line in f:
            m = re.match(r"^%?([\w.\-]+)\s+\([^)]*\)\s*->", line)
            if m and not line.startswith(" "):
                cur_comp = m.group(1)
                ops.setdefault(cur_comp, collections.Counter())
                continue
            if cur_comp is None:
                continue
            im = inst_re.match(line)
            if not im:
                continue
            inst = im.group(1)
            mm = meta_re.search(line)
            src = None
            if mm:
                meta = mm.group(1)
                om = opname_re.search(meta)
                sm = src_re.search(meta)
                tag = ""
                if om:
                    parts = om.group(1).split("/")
                    tag = "/".join(parts[-2:])
                if sm:
                    fn = os.path.basename(sm.group(1))
                    ln = sm.group(2) or "?"
                    src = f"{fn}:{ln} {tag}"
                elif om:
                    src = tag
            if src:
                ops[cur_comp][src] += 1
            cm = calls_re.search(line)
            if cm and not line.startswith(" %fused"):
                comp_of_op[inst] = cm.group(1)
    return ops, comp_of_op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("hlo")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--srcs", type=int, default=3)
    args = ap.parse_args()

    totals = load_trace_totals(args.trace, args.frames)
    ops, comp_of_op = load_hlo_ops(args.hlo)

    grand = sum(totals.values())
    print(f"total device op time: {grand:.2f} ms/frame")
    for name, ms in totals.most_common(args.top):
        srcs = None
        # direct: name is a computation (fusions are called 'fusion.24' both
        # as instruction and computation 'fused_computation.24')
        for cand in (
            name,
            name.replace("fusion", "fused_computation"),
            comp_of_op.get(name, ""),
            "region_" + name,
        ):
            if cand in ops and ops[cand]:
                srcs = ops[cand]
                break
        ann = ""
        if srcs:
            tops = ", ".join(f"{s} x{c}" for s, c in srcs.most_common(args.srcs))
            ann = f"  [{tops}]"
        print(f"{ms:9.3f} ms  {100 * ms / grand:5.1f}%  {name[:60]}{ann}")


if __name__ == "__main__":
    main()
