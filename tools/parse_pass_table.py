"""Aggregate an EXISTING jax profiler trace dir into the two-level per-pass
table (same logic as tools/pass_table4.py, without re-running the frame).

    python tools/parse_pass_table.py /tmp/jaxtrace_dio [n_frames]
"""
import collections
import glob
import gzip
import json
import os
import sys

trace_dir = sys.argv[1]
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1

paths = glob.glob(os.path.join(trace_dir,
                               "plugins/profile/*/*.trace.json.gz"))
with gzip.open(max(paths, key=os.path.getmtime)) as f:
    data = json.load(f)
ev = data["traceEvents"]
pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}

device_pids = {p for p, n in pid_names.items() if "TPU" in n}
if not device_pids:
    device_pids = {p for p, n in pid_names.items()
                   if "CPU" in n or "XLA" in n or "Host" in n}

agg = collections.Counter()
total = 0.0
for e in ev:
    if not (e.get("ph") == "X" and "dur" in e
            and e.get("pid") in device_pids):
        continue
    n = e.get("name", "")
    if n.startswith("jit_"):
        continue
    args = e.get("args", {}) or {}
    dur = float(args.get("device_duration_ps", 0)) / 1e9 or e["dur"] / 1000.0
    src = args.get("tf_op") or ""
    parts = [p for p in src.split("/") if p]
    while parts and (parts[0].startswith("jit(")
                     or parts[0].startswith("pjit")):
        parts = parts[1:]
    ctl = {"while", "body", "cond", "closed_call", "checkpoint",
           "branch_0_fun", "branch_1_fun"}
    named = [p for p in parts if p not in ctl and not p.endswith(":")][:2]
    head = "/".join(named) if named else None
    if not head:
        s = args.get("source") or ""
        if s:
            head = "src:" + s.split("/")[-1].split(":")[0]
        else:
            nm = e.get("name", "")
            head = "(un)" + nm.split(".")[0][:24]
    agg[head] += dur
    total += dur

print(f"{N} frames — device total {total:.1f} ms, "
      f"~{total / N:.1f} ms/frame\n")
print(f"{'pass':28s} {'ms/frame':>9s} {'share':>7s}")
for k, d in agg.most_common(40):
    print(f"{k[:28]:28s} {d / N:9.2f} {100 * d / total:6.1f}%")
