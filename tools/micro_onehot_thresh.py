import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import gzip, glob, json, os, tempfile, time, collections
import jax, jax.numpy as jnp
import numpy as np

R = 1920 * 1080
C = 30
key = jax.random.PRNGKey(0)

def consume_tr(ta):
    a = ta[0] * ta[4] - ta[1] * ta[3]
    b = ta[2] * ta[3] - ta[0] * ta[5]
    c = ta[1] * ta[5] - ta[2] * ta[4]
    return a + b + c + ta[6] + ta[7] + ta[8]

def make(t_rows):
    def f(tab, ix):
        one = (jax.lax.broadcasted_iota(jnp.int32, (t_rows, R), 0)
               == ix[None, :]).astype(jnp.float32)
        ta = jax.lax.dot_general(tab, one, (((0,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST)
        ta = jax.lax.optimization_barrier(ta)
        return consume_tr(ta)
    f.__name__ = f"f_oh{t_rows}"
    return f

sizes = [128, 256, 512, 1024, 2048]
fns, args = {}, {}
for t in sizes:
    tab = jax.random.normal(key, (t, C), jnp.float32)
    idx = jax.random.randint(key, (R,), 0, t)
    fns[t] = jax.jit(make(t))
    args[t] = (tab, idx)
for t in sizes:
    jax.block_until_ready(fns[t](*args[t]))
time.sleep(1)
td = tempfile.mkdtemp(prefix="micro_trace_")
with jax.profiler.trace(td):
    for t in sizes:
        for _ in range(3):
            out = fns[t](*args[t])
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
        if e.get("name", "").startswith("jit_f_oh"):
            agg[e["name"].split("(")[0]].append(e["dur"] / 1000.0)
for n, ds in sorted(agg.items(), key=lambda kv: int(kv[0].split("jit_f_oh")[-1])):
    print(f"{n:12s} median {np.median(ds):8.3f} ms")
