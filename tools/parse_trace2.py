import sys; sys.path.insert(0, "/root/repo")
import gzip, json, collections
path = sys.argv[1]
topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
with gzip.open(path) as f:
    data = json.load(f)
ev = data["traceEvents"]
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
rows = []
total = 0.0
for e in ev:
    if e.get("ph") == "X" and "dur" in e and "TPU" in names.get(e.get("pid"), ""):
        n = e["name"]
        if n.startswith("jit_"):
            continue
        args = e.get("args", {}) or {}
        src = args.get("source_info") or args.get("tf_op") or ""
        hlo = args.get("long_name") or args.get("hlo_op") or ""
        rows.append((e["dur"]/1000.0, n, src, hlo))
        total += e["dur"]/1000.0
rows.sort(reverse=True)
print(f"total device (excl jit wrapper): {total:.1f} ms, events: {len(rows)}")
agg = collections.Counter()
for d, n, src, hlo in rows:
    agg[src.split('/')[-1] if src else n] += d
print("--- by source ---")
for k, d in agg.most_common(topn):
    print(f"{d:9.2f} ms  {k[:130]}")
print("--- top events ---")
for d, n, src, hlo in rows[:topn]:
    print(f"{d:9.2f} ms  {n[:40]:42s} {src[:70]:70s} {str(hlo)[:60]}")
