import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
import numpy as np
from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.frame import RenderConfig, init_frame_state, render_frame
from kajiya_tpu.scene.cache import load_mesh_cached
from kajiya_tpu.scene.scene import Scene, build_gpu_scene
from kajiya_tpu.world import build_trace_scene
from kajiya_tpu.ops.hoist import jit_hoisted
from kajiya_tpu.renderers.gbuffer import raytrace_gbuffer

W, H = 1920, 1080
path = "/root/reference/assets/meshes/pica_pica_-_mini_diorama_01/scene.gltf"
scene = Scene()
scene.add_instance(scene.add_mesh(load_mesh_cached(path)), scale=(0.05, 0.05, 0.05))
gpu = build_gpu_scene(scene)
print("tris:", gpu.num_triangles, flush=True)
ts, levels = build_trace_scene(gpu)
view = make_view_constants((0.0, 0.6, 1.4), (0.0, -0.35, -1.0),
                           fov_y_deg=55.0, width=W, height=H)
mode = sys.argv[1] if len(sys.argv) > 1 else "gbuffer"
if mode == "gbuffer":
    f = jit_hoisted(lambda t, v: raytrace_gbuffer(t, v, W, H))
    out = f(ts, view)
    jax.block_until_ready(out["depth"])
    time.sleep(1)
    with jax.profiler.trace("/tmp/jaxtrace_dio"):
        out = f(ts, view)
        jax.block_until_ready(out["depth"])
        time.sleep(2)
    print("hit frac:", float(out["hit"].mean()), flush=True)
elif mode == "frame":
    cfg = RenderConfig(width=W, height=H)
    state = init_frame_state(cfg)
    step = jit_hoisted(lambda s: render_frame(ts, s, view, cfg, levels=levels))
    s2, out = step(state)
    s3, out = step(s2)
    jax.block_until_ready(out["final"])
    time.sleep(1)
    with jax.profiler.trace("/tmp/jaxtrace_dio"):
        s4, out = step(s3)
        jax.block_until_ready(out["final"])
        time.sleep(2)
print("done", flush=True)
