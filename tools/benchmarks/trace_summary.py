"""Summarize a jax.profiler trace (trace.json.gz) into per-bucket self-time.

Buckets the TPU op stream by name patterns relevant to the SSOD step
(deform-attn kernel fwd/bwd, layout permutes, fusions, convs, ...), and
prints per-step seconds assuming --steps timed steps in the capture.

Usage:
  python tools/benchmarks/trace_summary.py /tmp/ssod_trace_tiled --steps 3
  python tools/benchmarks/trace_summary.py <dir> --steps 3 --top 40
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_trace(trace_dir):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        return json.load(f), paths[-1]


BUCKETS = [
    # (bucket, regex over the XLA op name; first match wins)
    ("msda bwd kernel", re.compile(r"ms_deform_attn.*bwd|msda_bwd", re.I)),
    ("msda fwd kernel", re.compile(r"ms_deform_attn|msda|pallas|mosaic", re.I)),
    ("layout permutes (transpose/copy)", re.compile(r"^(transpose|copy|bitcast|reshape)", re.I)),
    ("gather/scatter/dus", re.compile(r"gather|scatter|dynamic-slice|dynamic_update|dynamic-update", re.I)),
    ("convolution", re.compile(r"convolution|conv", re.I)),
    ("fusion", re.compile(r"^(loop_)?fusion", re.I)),
    ("dot/matmul", re.compile(r"^dot|gemm|matmul", re.I)),
    ("while/scan machinery", re.compile(r"while|condition|body", re.I)),
    ("all-reduce/collective", re.compile(r"all-reduce|all-gather|collective|reduce-scatter", re.I)),
    ("infeed/outfeed/host", re.compile(r"infeed|outfeed|send|recv", re.I)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=3,
                    help="timed steps in the capture (divides totals)")
    ap.add_argument("--top", type=int, default=30,
                    help="also print the top-N individual ops by self time")
    ap.add_argument("--device-pid", type=int, default=None,
                    help="override the TPU pid (default: auto-detect)")
    args = ap.parse_args()

    tr, path = load_trace(args.trace_dir)
    ev = tr.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pid = args.device_pid
    if dev_pid is None:
        for pid, name in pid_names.items():
            if name and ("TPU" in name or "device" in name.lower()):
                dev_pid = pid
                break
    if dev_pid is None:
        raise SystemExit(f"no device pid found in {pid_names}")
    print(f"trace: {path}\ndevice pid {dev_pid} ({pid_names.get(dev_pid)}), "
          f"dividing by steps={args.steps}")

    # Use only the real op stream ("XLA Ops" lane); the Steps / XLA Modules
    # lanes are whole-step envelopes that would double-count everything.
    op_tids = {e["tid"] for e in ev
               if e.get("ph") == "M" and e.get("pid") == dev_pid
               and e.get("name") == "thread_name"
               and "XLA Ops" in (e["args"].get("name") or "")}

    # Device events can be nested (op inside fusion inside step); self time =
    # duration minus children on the same tid. Build per-tid sorted stacks.
    per_tid = collections.defaultdict(list)
    for e in ev:
        if (e.get("ph") == "X" and e.get("pid") == dev_pid and "dur" in e
                and (not op_tids or e.get("tid") in op_tids)):
            per_tid[e.get("tid", 0)].append((e["ts"], e["ts"] + e["dur"], e))

    op_self = collections.Counter()
    total_self = 0.0
    for tid, rows in per_tid.items():
        rows.sort(key=lambda r: (r[0], -(r[1] - r[0])))
        stack = []  # (end, child_time_accum_index into list)
        child_time = []
        for ts, te, e in rows:
            while stack and stack[-1][0] <= ts + 1e-9:
                end, name, dur, ct = stack.pop()
                self_us = max(0.0, dur - ct)
                op_self[name] += self_us
                if stack:
                    stack[-1] = (stack[-1][0], stack[-1][1], stack[-1][2],
                                 stack[-1][3] + dur)
            stack.append((te, e.get("name", "?"), te - ts, 0.0))
        while stack:
            end, name, dur, ct = stack.pop()
            self_us = max(0.0, dur - ct)
            op_self[name] += self_us
            if stack:
                stack[-1] = (stack[-1][0], stack[-1][1], stack[-1][2],
                             stack[-1][3] + dur)
    total_self = sum(op_self.values())

    bucket_us = collections.Counter()
    for name, us in op_self.items():
        for bucket, rx in BUCKETS:
            if rx.search(name):
                bucket_us[bucket] += us
                break
        else:
            bucket_us["other"] += us

    print(f"\ntotal device self-time: {total_self/1e6:.3f} s "
          f"({total_self/1e6/args.steps:.3f} s/step)")
    print(f"\n{'bucket':<36} {'s/step':>8} {'share':>7}")
    for bucket, us in bucket_us.most_common():
        print(f"{bucket:<36} {us/1e6/args.steps:>8.3f} "
              f"{100*us/max(total_self,1):>6.1f}%")

    print(f"\ntop {args.top} ops by self time (s/step):")
    for name, us in op_self.most_common(args.top):
        print(f"  {us/1e6/args.steps:>7.3f}  {name[:110]}")


if __name__ == "__main__":
    main()
