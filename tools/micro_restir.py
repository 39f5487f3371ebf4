"""On-chip micro-profile of restir_gi.restir_diffuse at 1080p-half, with
device-time aggregated by source line groups (pack/warp/scan/etc).

Run EXCLUSIVELY on the TPU: python tools/micro_restir.py
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
from kajiya_tpu.renderers import restir_gi
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene

H, W = 1080, 1920
hh, hw = H // 2, W // 2

rng = np.random.default_rng(0)


def plane(*shape):
    return jnp.asarray(rng.random(shape, np.float32))


gb_h = {
    "hit": jnp.ones((hh, hw), bool),
    "normal": plane(hh, hw, 3) * 0.2 + jnp.asarray([0.0, 1.0, 0.0]),
    "pos": plane(hh, hw, 3) * 4.0,
    "depth": plane(hh, hw) * 0.5 + 0.2,
}
state = restir_gi.init_state(hh * 2, hw * 2)
candidates = {
    "radiance": plane(hh, hw, 3),
    "hit_pos": plane(hh, hw, 3) * 4.0,
    "hit_normal": plane(hh, hw, 3),
    "ray_dir": plane(hh, hw, 3),
    "valid": jnp.ones((hh, hw), bool),
}
reproj = {
    "prev_uv": jnp.stack(jnp.meshgrid(
        (jnp.arange(hw * 2) + 0.5) / (hw * 2),
        (jnp.arange(hh * 2) + 0.5) / (hh * 2))[::1], axis=-1)[..., ::-1],
    "validity": jnp.ones((hh * 2, hw * 2), jnp.float32),
}
view = make_view_constants((0, 0, 2.4), (0, 0, -1), fov_y_deg=55.0,
                           width=hw * 2, height=hh * 2)


@jax.jit
def step(st, cand):
    res, new_state = restir_gi.restir_diffuse(st, cand, gb_h, reproj, 7,
                                              view=view)
    return res["w_sum"] + res["M"], new_state


out, ns = step(state, candidates)
jax.block_until_ready(out)
t0 = time.perf_counter()
trace_dir = tempfile.mkdtemp(prefix="restir_micro_")
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        out, ns = step(state, candidates)
    jax.block_until_ready(out)
    time.sleep(2)
print(f"wall {(time.perf_counter() - t0) * 1e3:.0f} ms / 3 iters")

paths = glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz")
with gzip.open(max(paths, key=_os.path.getmtime)) as f:
    data = json.load(f)
ev = data["traceEvents"]
pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
dev = {p for p, n in pid_names.items() if "TPU" in n}
agg = collections.Counter()
total = 0.0
for e in ev:
    if not (e.get("ph") == "X" and "dur" in e and e.get("pid") in dev):
        continue
    if e.get("name", "").startswith("jit_"):
        continue
    args = e.get("args", {}) or {}
    dur = float(args.get("device_duration_ps", 0)) / 1e9 or e["dur"] / 1e3
    src = args.get("source") or ""
    opn = (args.get("tf_op") or "").split("/")
    key = (src.split("/")[-1] if src else "?") + " | " + \
        "/".join(p for p in opn[-2:])
    agg[key] += dur
    total += dur
print(f"device total {total / 3:.2f} ms/iter")
for k, d in agg.most_common(30):
    print(f"{d / 3:8.3f}  {k[:110]}")
