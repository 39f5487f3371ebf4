"""Per-pass table + top individual ops (optionally filtered to one pass)."""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import gzip, json, collections, re
path = sys.argv[1]
only = sys.argv[2] if len(sys.argv) > 2 else None
with gzip.open(path) as f:
    data = json.load(f)
ev = data["traceEvents"]
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
ops = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and "dur" in e and "TPU" in names.get(e.get("pid"), ""):
        n = e["name"]
        if n.startswith("jit_"):
            continue
        args = e.get("args", {}) or {}
        src = args.get("source_info") or args.get("tf_op") or ""
        m = re.match(r"jit\(g\)/([a-z_]+)/", src)
        p = m.group(1) if m else "(untagged)"
        if only and p != only:
            continue
        ops[(p, n, src[:120])] += e["dur"] / 1000.0
for (p, n, src), d in ops.most_common(40):
    print(f"{d:8.2f}  {p:12s} {n[:60]:60s} {src[:90]}")
