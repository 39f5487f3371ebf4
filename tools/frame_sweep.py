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

key = jax.random.PRNGKey(0)
def probe(tag):
    H, W = 1080, 1920
    img = jnp.zeros((H, W, 4))
    iy = jax.random.randint(key, (H, W), 0, H)
    ix = jax.random.randint(key, (H, W), 0, W)
    g = jax.jit(lambda a, y, x: a[y, x] * 2.0)
    out = g(img, iy, ix); jax.block_until_ready(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); out = g(img, iy, ix); jax.block_until_ready(out)
        ts.append((time.perf_counter()-t0)*1e3)
    print(f"  [probe {tag:6s}] {np.median(ts):8.3f} ms", flush=True)

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
state = init_frame_state(cfg)
step = jit_hoisted(lambda s: render_frame(ts, s, view, cfg, levels=levels))
probe("pre")
t0 = time.perf_counter()
state, out = step(state)
e = float(np.asarray(out["exposure"]))
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
times = []
for _ in range(6):
    t0 = time.perf_counter()
    state, out = step(state)
    e = float(np.asarray(out["exposure"]))
    times.append((time.perf_counter()-t0)*1e3)
print(f"frame: {np.median(times):.1f} ms  (cfg={kw})", flush=True)
probe("post")
