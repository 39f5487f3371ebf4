"""Large-table (76k rows) hit-attr fetch variants."""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import gzip, glob, json, os, tempfile, time, collections
import jax, jax.numpy as jnp
import numpy as np

R = 1920 * 1080
T = 76800
C = 30

key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (T, C), jnp.float32)
idx = jax.random.randint(key, (R,), 0, T)

def consume_tr(rows):     # rows: list of (R,)
    a = rows[0] * rows[4] - rows[1] * rows[3]
    b = rows[2] * rows[3] - rows[0] * rows[5]
    c = rows[1] * rows[5] - rows[2] * rows[4]
    d = rows[6] + rows[7] + rows[8]
    return a + b + c + d

def f_wide(tab, ix):
    ta = tab.at[ix].get(mode="promise_in_bounds")
    ta = jax.lax.optimization_barrier(ta)
    return consume_tr([ta[:, i] for i in range(9)])

def f_wide_T(tab, ix):
    ta = tab.at[ix].get(mode="promise_in_bounds")
    ta = jax.lax.optimization_barrier(ta.T)
    return consume_tr([ta[i] for i in range(9)])

def f_cols(tab, ix):
    cols = [tab[:, i].at[ix].get(mode="promise_in_bounds") for i in range(9)]
    cols = jax.lax.optimization_barrier(cols)
    return consume_tr(cols)

def f_col_pairs(tab, ix):
    # gather (T, 2)-wide strips: fewer gathers, small pad (2->128 bad!)
    ta = tab[:, :9].at[ix].get(mode="promise_in_bounds")
    ta = jax.lax.optimization_barrier(ta)
    return consume_tr([ta[:, i] for i in range(9)])

cands = [("f_wide", f_wide), ("f_wide_T", f_wide_T), ("f_cols", f_cols),
         ("f_col_pairs", f_col_pairs)]
fns = {n: jax.jit(f) for n, f in cands}
for n, f in fns.items():
    jax.block_until_ready(f(table, idx))
time.sleep(1)
td = tempfile.mkdtemp(prefix="micro_trace_")
with jax.profiler.trace(td):
    for n, f in fns.items():
        for _ in range(3):
            out = f(table, idx)
    jax.block_until_ready(out)
    time.sleep(2)
paths = glob.glob(os.path.join(td, "plugins/profile/*/*.trace.json.gz"))
with gzip.open(max(paths, key=os.path.getmtime)) as f:
    data = json.load(f)
ev = data["traceEvents"]
names = {e["pid"]: e["args"].get("name", "") for e in ev
         if e.get("ph") == "M" and e.get("name") == "process_name"}
agg = collections.defaultdict(list)
for e in ev:
    if e.get("ph") == "X" and "dur" in e and "TPU" in names.get(e.get("pid"), ""):
        if e.get("name", "").startswith("jit_f_"):
            agg[e["name"]].append(e["dur"] / 1000.0)
for n, ds in sorted(agg.items()):
    print(f"{n:40s} median {np.median(ds):8.3f} ms  (n={len(ds)})")
