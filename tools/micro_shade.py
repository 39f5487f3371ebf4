"""On-chip micro-profile of hit_radiance (the gi_trace/shade hot spot) at
the frame's real wavefront size, aggregated by source line.

Run EXCLUSIVELY on the TPU: python tools/micro_shade.py [n_rays]
"""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import collections
import glob
import gzip
import json
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.renderers.hit_lighting import hit_radiance
from kajiya_tpu.rt.trace import scene_trace_closest
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.sky import env as sky_env_mod
from kajiya_tpu.world import build_trace_scene

R = int(sys.argv[1]) if len(sys.argv) > 1 else (960 * 540 * 2)

gpu = build_gpu_scene(cornell_box())
ts, levels = build_trace_scene(gpu)
view = make_view_constants((0, 0, 2.4), (0, 0, -1), fov_y_deg=55.0,
                           width=1920, height=1080)
sun_dir = gpu.sun_direction
small = sky_env_mod.build_sky_env(sun_dir, res=32)
sky_sh = sky_env_mod.project_sh9(small)
sky_env = sky_env_mod.sh9_radiance_fn(sky_sh)
diffuse_env = sky_env_mod.sh9_irradiance_fn(sky_sh)

rng = np.random.default_rng(0)
org = jnp.asarray(rng.random((R, 3), np.float32) * 1.6 - 0.8)
d = rng.standard_normal((R, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d)
rngs = jnp.asarray(rng.integers(0, 2**32, (R,), np.uint32))
prev_lit = jnp.asarray(rng.random((270, 480, 3), np.float32))
prev_depth = jnp.asarray(rng.random((270, 480), np.float32) * 0.5 + 0.1)


@jax.jit
def step(o, dd, rr):
    hit = scene_trace_closest(ts, o, dd, t_min=1e-4, max_steps=256)
    rad = hit_radiance(ts, hit, dd, sky_env, diffuse_env, rng=rr,
                       prev_lit=prev_lit, prev_depth=prev_depth, view=view)
    return rad


out = step(org, d, rngs)
jax.block_until_ready(out)
trace_dir = tempfile.mkdtemp(prefix="shade_micro_")
t0 = time.perf_counter()
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        out = step(org, d, rngs)
    jax.block_until_ready(out)
    time.sleep(2)
print(f"wall {(time.perf_counter() - t0) * 1e3:.0f} ms / 3 iters ({R} rays)")

paths = glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz")
with gzip.open(max(paths, key=_os.path.getmtime)) as f:
    data = json.load(f)
ev = data["traceEvents"]
pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
dev = {p for p, n in pid_names.items() if "TPU" in n}
agg = collections.Counter()
scopes = collections.Counter()
total = 0.0
for e in ev:
    if not (e.get("ph") == "X" and "dur" in e and e.get("pid") in dev):
        continue
    if e.get("name", "").startswith("jit_"):
        continue
    args = e.get("args", {}) or {}
    dur = float(args.get("device_duration_ps", 0)) / 1e9 or e["dur"] / 1e3
    src = args.get("source") or ""
    opn = (args.get("tf_op") or "")
    key = (src.split("/")[-1] if src else "?") + " | " + \
        "/".join(opn.split("/")[-2:])
    agg[key] += dur
    # scope-level: first named component after jit()
    parts = [p for p in opn.split("/") if p and not p.startswith("jit(")
             and not p.startswith("pjit")]
    ctl = {"while", "body", "cond", "closed_call", "checkpoint",
           "branch_0_fun", "branch_1_fun"}
    named = [p for p in parts if p not in ctl and not p.endswith(":")]
    scopes["/".join(named[:2]) or "(?)"] += dur
    total += dur
print(f"device total {total / 3:.2f} ms/iter")
print("--- by scope")
for k, v in scopes.most_common(12):
    print(f"{v / 3:8.3f}  {k[:90]}")
print("--- by line")
for k, v in agg.most_common(25):
    print(f"{v / 3:8.3f}  {k[:110]}")
