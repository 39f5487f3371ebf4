"""Per-pass ms table from a scoped trace (docs/architecture.md table)."""
import sys; sys.path.insert(0, "/root/repo")
import gzip, json, collections, re
path = sys.argv[1]
with gzip.open(path) as f:
    data = json.load(f)
ev = data["traceEvents"]
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
agg = collections.Counter()
total = 0.0
for e in ev:
    if e.get("ph") == "X" and "dur" in e and "TPU" in names.get(e.get("pid"), ""):
        n = e["name"]
        if n.startswith("jit_"):
            continue
        args = e.get("args", {}) or {}
        src = args.get("source_info") or args.get("tf_op") or ""
        m = re.match(r"jit\(g\)/([a-z_]+)/", src)
        agg[m.group(1) if m else "(untagged)"] += e["dur"] / 1000.0
        total += e["dur"] / 1000.0
print(f"{'pass':18s} {'ms':>9s}  {'%':>5s}")
for k, d in agg.most_common():
    print(f"{k:18s} {d:9.2f}  {100*d/total:5.1f}")
print(f"{'TOTAL':18s} {total:9.2f}")
