import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np
from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.frame import RenderConfig, init_frame_state, render_frame
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene
from kajiya_tpu.ops.hoist import jit_hoisted

W, H = 1920, 1080
gpu = build_gpu_scene(cornell_box())
ts, levels = build_trace_scene(gpu)
view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                           fov_y_deg=55.0, width=W, height=H)
kw = {}
for a in sys.argv[1:]:
    k, v = a.split("=")
    kw[k] = v == "1" if v in "01" else int(v)
cfg = RenderConfig(width=W, height=H, max_trace_steps=96, **kw)
state0 = init_frame_state(cfg)
step = jit_hoisted(lambda s: render_frame(ts, s, view, cfg, levels=levels))
# warm both weak-type signatures WITHOUT any readback
s1, out = step(state0)
s2, out = step(s1)
jax.block_until_ready(out["final"])
time.sleep(1.0)

def timed_chain(n, s):
    t0 = time.perf_counter()
    for _ in range(n):
        s, out = step(s)
    e = float(np.asarray(out["exposure"]))      # forces completion of chain
    return (time.perf_counter() - t0) * 1e3, s

import os
n = int(os.environ.get("CHAIN_N", "1"))
t1, s = timed_chain(n, s2)
print(f"chain {n}:  {t1:9.1f} ms", flush=True)
