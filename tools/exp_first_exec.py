import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np
from kajiya_tpu.core import img as im

which = sys.argv[1] if len(sys.argv) > 1 else "frame"
H, W = 1080, 1920

if which == "gathers10":
    # ten chained bilinear warps in ONE program, fresh session
    key = jax.random.PRNGKey(0)
    img = jnp.abs(jax.random.normal(key, (H, W, 4)))
    uv = im.pixel_uv(H, W) + jax.random.normal(key, (H, W, 2)) * 0.003
    def f(p, u):
        for i in range(10):
            p = im.sample_bilinear(p, u) * 0.999
        return p
    g = jax.jit(f)
    c = g.lower(img, uv).compile()
    for i in range(4):
        t0 = time.perf_counter(); out = c(img, uv); jax.block_until_ready(out)
        print(f"exec {i}: {(time.perf_counter()-t0)*1e3:8.2f} ms", flush=True)
elif which == "frame":
    from kajiya_tpu.core.camera import make_view_constants
    from kajiya_tpu.frame import RenderConfig, init_frame_state, render_frame
    from kajiya_tpu.scene.procedural import cornell_box
    from kajiya_tpu.scene.scene import build_gpu_scene
    from kajiya_tpu.world import build_trace_scene
    gpu = build_gpu_scene(cornell_box())
    ts, levels = build_trace_scene(gpu)
    view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                               fov_y_deg=55.0, width=W, height=H)
    cfg = RenderConfig(width=W, height=H, max_trace_steps=96)
    state = init_frame_state(cfg)
    step = jax.jit(lambda s: render_frame(ts, s, view, cfg, levels=levels))
    t0 = time.perf_counter()
    c = step.lower(state).compile()
    print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)
    for i in range(4):
        t0 = time.perf_counter(); s2, out = c(state); jax.block_until_ready(out["final"])
        print(f"exec {i}: {(time.perf_counter()-t0)*1e3:8.2f} ms", flush=True)
        state = s2
