import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
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
cfg = RenderConfig(width=W, height=H, max_trace_steps=96)
state = init_frame_state(cfg)
step = jit_hoisted(lambda s: render_frame(ts, s, view, cfg, levels=levels))
s1, out = step(state)
s2, out = step(s1)
jax.block_until_ready(out["final"])
time.sleep(2)
print("warmed, tracing...", flush=True)
with jax.profiler.trace("/tmp/jaxtrace8"):
    s3, out = step(s2)
    jax.block_until_ready(out["final"])
    time.sleep(3)     # give async execution time to land inside the trace
print("done", flush=True)
