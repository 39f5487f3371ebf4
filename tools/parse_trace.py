import gzip, json, collections, sys
path = sys.argv[1]
with gzip.open(path) as f:
    data = json.load(f)
ev = data["traceEvents"]
# find TPU device op events: pid/tid mapping
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
dur_by_name = collections.Counter()
cnt = collections.Counter()
total = 0.0
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        pn = names.get(e.get("pid"), "")
        if "TPU" in pn or "Device" in pn or "tpu" in pn.lower():
            n = e["name"]
            dur_by_name[n] += e["dur"]
            cnt[n] += 1
            total += e["dur"]
print("process names:", set(names.values()))
print(f"total device us: {total:.0f}")
for n, d in dur_by_name.most_common(40):
    print(f"{d/1000:9.2f} ms {cnt[n]:5d}x  {n[:110]}")
