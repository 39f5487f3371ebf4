"""Two-level per-pass table (pass/subpass): run N full frames under the profiler and
aggregate device time by top-level pass_scope (the `gi-overview.md:452`
table for docs/architecture.md).

Usage (EXCLUSIVE on the TPU — no other python):
    python tools/pass_table3.py [width height] [frames] [scene]
    scene: cornell (default) | diorama | city
"""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import collections
import glob
import gzip
import json
import os
import tempfile
import time

import jax
import numpy as np

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
N = int(sys.argv[3]) if len(sys.argv) > 3 else 3
SCENE = sys.argv[4] if len(sys.argv) > 4 else "cornell"

from kajiya_tpu.core import jitcache
from kajiya_tpu.core.camera import make_view_constants

jitcache.enable()
from kajiya_tpu.frame import RenderConfig, init_frame_state, render_frame
from kajiya_tpu.ops.hoist import jit_hoisted
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import Scene, build_gpu_scene
from kajiya_tpu.world import build_trace_scene

if SCENE == "diorama":
    from kajiya_tpu.scene.cache import load_mesh_cached

    scene = Scene()
    scene.add_instance(scene.add_mesh(load_mesh_cached(
        "/root/reference/assets/meshes/pica_pica_-_mini_diorama_01/"
        "scene.gltf")), scale=(0.05, 0.05, 0.05))
    cam = ((0.0, 0.6, 1.4), (0.0, -0.35, -1.0))
elif SCENE == "city":
    from kajiya_tpu.scene.procedural import city

    scene = city(n=16, subdiv=8)
    cam = ((0.0, 14.0, 28.0), (0.0, -0.45, -1.0))
else:
    scene = cornell_box()
    cam = ((0.0, 0.0, 2.4), (0.0, 0.0, -1.0))
gpu = build_gpu_scene(scene)
ts, levels = build_trace_scene(gpu)
print(f"scene={SCENE}: {int(gpu.num_triangles)} tris", flush=True)
view = make_view_constants(cam[0], cam[1], fov_y_deg=55.0,
                           width=W, height=H)
cfg = RenderConfig(width=W, height=H)
state = init_frame_state(cfg)
step = jit_hoisted(lambda s: render_frame(ts, s, view, cfg, levels=levels))

state, out = step(state)
state, out = step(state)
jax.block_until_ready(out["final"])
time.sleep(1)

trace_dir = tempfile.mkdtemp(prefix="kajiya_pass_table_")
with jax.profiler.trace(trace_dir):
    for _ in range(N):
        state, out = step(state)
    jax.block_until_ready(out["final"])
    time.sleep(2)

paths = glob.glob(os.path.join(trace_dir,
                               "plugins/profile/*/*.trace.json.gz"))
with gzip.open(max(paths, key=os.path.getmtime)) as f:
    data = json.load(f)
ev = data["traceEvents"]
pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}

device_pids = {p for p, n in pid_names.items() if "TPU" in n}
if not device_pids:      # CPU smoke runs: take the busiest non-python pid
    device_pids = {p for p, n in pid_names.items()
                   if "CPU" in n or "XLA" in n or "Host" in n}

agg = collections.Counter()
total = 0.0
for e in ev:
    if not (e.get("ph") == "X" and "dur" in e
            and e.get("pid") in device_pids):
        continue
    n = e.get("name", "")
    if n.startswith("jit_"):
        continue
    args = e.get("args", {}) or {}
    dur = float(args.get("device_duration_ps", 0)) / 1e9 or e["dur"] / 1000.0
    src = args.get("tf_op") or ""
    parts = [p for p in src.split("/") if p]
    # strip the jit(...) wrapper the profiler now prefixes, then the first
    # named_scope component is the pass; scan/while bodies lose the scope,
    # fall back to the python source file
    while parts and (parts[0].startswith("jit(")
                     or parts[0].startswith("pjit")):
        parts = parts[1:]
    ctl = {"while", "body", "cond", "closed_call", "checkpoint",
           "branch_0_fun", "branch_1_fun"}
    named = [p for p in parts if p not in ctl and not p.endswith(":")][:2]
    head = "/".join(named) if named else None
    if not head:
        s = args.get("source") or ""
        if s:
            head = "src:" + s.split("/")[-1].split(":")[0]
        else:
            # explain unattributed device time by HLO op-name prefix
            nm = e.get("name", "")
            head = "(un)" + nm.split(".")[0][:24]
    agg[head] += dur
    total += dur

per_frame = total / max(N, 1)
print(f"\n{W}x{H}, {N} frames — device total {total:.1f} ms, "
      f"~{per_frame:.1f} ms/frame\n")
print(f"{'pass':28s} {'ms/frame':>9s} {'share':>7s}")
for k, d in agg.most_common(40):
    print(f"{k[:28]:28s} {d / N:9.2f} {100 * d / total:6.1f}%")
