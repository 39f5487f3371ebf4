"""Device cost of the ircache-alloc scatter patterns: scatter-max of Q
updates into an N-cell grid, vs a sort-based segment-max formulation.

Run EXCLUSIVELY on the TPU: python tools/micro_scatter.py
"""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import glob
import gzip
import json
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np


def devtime(f, *args, iters=5):
    out = f(*args)
    jax.block_until_ready(out)
    td = tempfile.mkdtemp(prefix="sc_")
    with jax.profiler.trace(td):
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        time.sleep(1)
    paths = glob.glob(td + "/plugins/profile/*/*.trace.json.gz")
    with gzip.open(max(paths, key=_os.path.getmtime)) as fh:
        data = json.load(fh)
    ev = data["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pid_names.items() if "TPU" in n}
    tot = sum((float((e.get("args") or {}).get("device_duration_ps", 0))
               / 1e9 or e["dur"] / 1e3)
              for e in ev if e.get("ph") == "X" and "dur" in e
              and e.get("pid") in dev
              and not e.get("name", "").startswith("jit_"))
    return tot / iters


rng = np.random.default_rng(0)
Q, N = 32768, 12 * 32 ** 3
flat = jnp.asarray(rng.integers(0, N, (Q,), np.int32))
val = jnp.asarray(rng.integers(0, Q, (Q,), np.int32))


@jax.jit
def scatter_max(f, v):
    g = jnp.full((N,), -1, jnp.int32)
    return g.at[f].max(v, mode="promise_in_bounds")


@jax.jit
def scatter_max3(f, v):
    g = jnp.full((N,), -1, jnp.int32)
    a = g.at[f].max(v, mode="promise_in_bounds")
    b = g.at[f].max(v + 1, mode="promise_in_bounds")
    c = g.at[f].max(v + 2, mode="promise_in_bounds")
    return a, b, c


@jax.jit
def sorted_segmax(f, v):
    # sort by cell, then the winner of each cell is the last element of its
    # run; scatter the per-run winners (unique indices) into the grid
    sf, sv = jax.lax.sort((f, v), num_keys=1)
    is_last = jnp.concatenate([sf[1:] != sf[:-1], jnp.ones((1,), bool)])
    g = jnp.full((N,), -1, jnp.int32)
    return g.at[jnp.where(is_last, sf, 0)].max(
        jnp.where(is_last, sv, -1), mode="promise_in_bounds")


print(f"scatter_max 1x: {devtime(scatter_max, flat, val):7.3f} ms")
print(f"scatter_max 3x: {devtime(scatter_max3, flat, val):7.3f} ms")
print(f"sorted_segmax : {devtime(sorted_segmax, flat, val):7.3f} ms")

# the gather side (grid[flat]) for reference
@jax.jit
def gath(f):
    g = jnp.arange(N, dtype=jnp.int32)
    return g.at[f].get(mode="promise_in_bounds")


print(f"grid gather   : {devtime(gath, flat):7.3f} ms")
