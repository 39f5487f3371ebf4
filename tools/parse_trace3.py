"""Aggregate device trace events by full jit scope path (pass attribution)."""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import gzip, json, collections
path = sys.argv[1]
topn = int(sys.argv[2]) if len(sys.argv) > 2 else 60
with gzip.open(path) as f:
    data = json.load(f)
ev = data["traceEvents"]
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
agg = collections.Counter()
cnt = collections.Counter()
total = 0.0
for e in ev:
    if e.get("ph") == "X" and "dur" in e and "TPU" in names.get(e.get("pid"), ""):
        n = e["name"]
        if n.startswith("jit_"):
            continue
        args = e.get("args", {}) or {}
        src = args.get("source_info") or args.get("tf_op") or n
        agg[src] += e["dur"] / 1000.0
        cnt[src] += 1
        total += e["dur"] / 1000.0
print(f"total device: {total:.1f} ms over {sum(cnt.values())} events")
for k, d in agg.most_common(topn):
    print(f"{d:9.2f} ms  x{cnt[k]:<4d} {k[:150]}")
