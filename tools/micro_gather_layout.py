"""Decide the hit-attribute fetch design: padded wide gather vs transposed
forms vs one-hot matmul. Times come from a profiler trace (device spans),
not wall clock (tunnel async lies)."""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import gzip, glob, json, os, tempfile, time, collections
import jax, jax.numpy as jnp
import numpy as np

R = 1920 * 1080
T_SMALL = 64
C = 30

key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (T_SMALL, C), jnp.float32)
idx = jax.random.randint(key, (R,), 0, T_SMALL)

def consume_wide(ta):
    # mimic 3 independent consumers (cross-product style slice math)
    a = (ta[:, 0:1] * ta[:, 4:5] - ta[:, 1:2] * ta[:, 3:4]).sum(-1)
    b = (ta[:, 2:3] * ta[:, 3:4] - ta[:, 0:1] * ta[:, 5:6]).sum(-1)
    c = (ta[:, 1:2] * ta[:, 5:6] - ta[:, 2:3] * ta[:, 4:5]).sum(-1)
    d = ta[:, 6:9].sum(-1)
    return a + b + c + d

def consume_tr(ta):     # ta: (C, R)
    a = ta[0] * ta[4] - ta[1] * ta[3]
    b = ta[2] * ta[3] - ta[0] * ta[5]
    c = ta[1] * ta[5] - ta[2] * ta[4]
    d = ta[6] + ta[7] + ta[8]
    return a + b + c + d

def f_base(tab, ix):
    ta = tab.at[ix].get(mode="promise_in_bounds")
    ta = jax.lax.optimization_barrier(ta)
    return consume_wide(ta)

def f_transpose(tab, ix):
    ta = tab.at[ix].get(mode="promise_in_bounds")
    ta = jax.lax.optimization_barrier(ta.T)      # materialize (C, R)
    return consume_tr(ta)

def f_onehot(tab, ix):
    one = (jax.lax.broadcasted_iota(jnp.int32, (T_SMALL, R), 0)
           == ix[None, :]).astype(jnp.float32)   # (T, R)
    ta = jax.lax.dot_general(tab, one, (((0,), (0,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST)  # (C, R)
    ta = jax.lax.optimization_barrier(ta)
    return consume_tr(ta)

def f_onehot_2pass(tab, ix):
    # exact f32 via hi/lo bf16 split: 2 MXU passes instead of 6
    one = (jax.lax.broadcasted_iota(jnp.int32, (T_SMALL, R), 0)
           == ix[None, :]).astype(jnp.bfloat16)
    hi = tab.astype(jnp.bfloat16)
    lo = (tab - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda m: jax.lax.dot_general(
        m, one, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ta = jax.lax.optimization_barrier(d(hi) + d(lo))
    return consume_tr(ta)

cands = [("wide_gather", f_base), ("gather_T", f_transpose),
         ("onehot_high", f_onehot), ("onehot_2pass", f_onehot_2pass)]

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

# parse: aggregate per jit function name
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
    print(f"{n:24s} median {np.median(ds):8.3f} ms  (n={len(ds)})")
