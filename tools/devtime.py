"""Device-honest micro timing via the jax profiler (library).

Through the remote-TPU tunnel, wall-clock around block_until_ready is wrong
in both directions (see bench.py docstring). The only trustworthy datum is
the device span of the top-level jit execution in a profiler trace. This
wraps that: `device_ms(fn, *args)` compiles fn under a uniquely-named jit,
runs it N times inside a trace, and returns the median device duration of
the matching jit events.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile
import time

import numpy as np


def _jit_events_ms(trace_dir, match: str):
    paths = glob.glob(os.path.join(trace_dir,
                                   "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return []
    with gzip.open(max(paths, key=os.path.getmtime)) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    out = []
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pid_names.get(e.get("pid"), ""):
            continue
        name = e.get("name", "")
        if name.startswith(f"jit_{match}"):
            out.append(e["dur"] / 1000.0)
    return out


_COUNTER = [0]


def device_ms(fn, *args, iters: int = 6, warmup: int = 2,
              name: str | None = None):
    """Median on-device ms of jit(fn)(*args). None if no trace captured."""
    import jax

    _COUNTER[0] += 1
    tag = name or f"uft{_COUNTER[0]}"

    def named(*a):
        return fn(*a)

    named.__name__ = tag
    jf = jax.jit(named)
    out = None
    for _ in range(warmup):
        out = jf(*args)
    jax.block_until_ready(out)
    trace_dir = tempfile.mkdtemp(prefix="kajiya_devtime_")
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = jf(*args)
        jax.block_until_ready(out)
        time.sleep(1.5)
    evs = _jit_events_ms(trace_dir, tag)
    if not evs:
        return None
    return float(np.median(evs))
