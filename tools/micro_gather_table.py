"""Serial-gather cost vs table size: does fetching 1M random rows get
cheaper when the table fits in cache? Informs the screen-reuse design
(full-res vs decimated prev-frame source).

Run EXCLUSIVELY on the TPU: python tools/micro_gather_table.py
"""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

R = 1 << 20
rng = np.random.default_rng(0)

for rows, ch in [(2073600, 4), (518400, 4), (129600, 4), (32400, 4),
                 (129600, 8), (2073600, 1)]:
    tab = jnp.asarray(rng.random((rows, ch), np.float32))
    idx = jnp.asarray(rng.integers(0, rows, (R,), np.int32))

    @jax.jit
    def f(t, i):
        return jnp.sum(t.at[i].get(mode="promise_in_bounds"), axis=0)

    out = f(tab, idx)
    jax.block_until_ready(out)
    # device-trace timing (wall clock through the tunnel lies)
    import glob, gzip, json, tempfile
    td = tempfile.mkdtemp(prefix="gat_")
    with jax.profiler.trace(td):
        for _ in range(5):
            out = f(tab, idx)
        jax.block_until_ready(out)
        time.sleep(1)
    paths = glob.glob(td + "/plugins/profile/*/*.trace.json.gz")
    with gzip.open(max(paths, key=_os.path.getmtime)) as fh:
        data = json.load(fh)
    ev = data["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {pp for pp, n in pid_names.items() if "TPU" in n}
    tot = sum((float((e.get("args") or {}).get("device_duration_ps", 0))
               / 1e9 or e["dur"] / 1e3)
              for e in ev if e.get("ph") == "X" and "dur" in e
              and e.get("pid") in dev
              and not e.get("name", "").startswith("jit_"))
    ms = tot / 5
    print(f"rows {rows:8d} x{ch}ch: {ms:7.2f} ms "
          f"({ms * 1e6 / R:.2f} ns/row)", flush=True)
