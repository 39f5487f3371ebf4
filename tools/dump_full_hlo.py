import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.frame import RenderConfig, init_frame_state, render_frame
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene

W, H = 1920, 1080
gpu = build_gpu_scene(cornell_box())
ts, levels = build_trace_scene(gpu)
view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                           fov_y_deg=55.0, width=W, height=H)
cfg = RenderConfig(width=W, height=H, max_trace_steps=96)
state = init_frame_state(cfg)

f = lambda s: render_frame(ts, s, view, cfg, levels=levels)
cj, out_shape = jax.make_jaxpr(f, return_shape=True)(state)
consts = [jnp.asarray(c) for c in cj.consts]
out_tree = jax.tree_util.tree_structure(out_shape)
def g(consts_, flat_args):
    out_flat = jax.core.eval_jaxpr(cj.jaxpr, consts_, *flat_args)
    return jax.tree_util.tree_unflatten(out_tree, out_flat)
flat, _ = jax.tree_util.tree_flatten((state,))
txt = jax.jit(g).lower(consts, flat).compile().as_text()
open("/tmp/hlo_full.txt", "w").write(txt)
print("HLO lines:", len(txt.splitlines()), flush=True)
