import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.frame import RenderConfig, init_frame_state, render_frame
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene
from kajiya_tpu.ops.hoist import jit_hoisted

W, H = 128, 96
gpu = build_gpu_scene(cornell_box())
ts, levels = build_trace_scene(gpu)
view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                           fov_y_deg=55.0, width=W, height=H)
cfg = RenderConfig(width=W, height=H, max_trace_steps=96)
f = lambda s: render_frame(ts, s, view, cfg, levels=levels)
s0 = init_frame_state(cfg)
s1, o1 = jax.jit(f)(s0)
s2, o2 = jit_hoisted(f)(s0)
a, b = np.asarray(o1["final"]), np.asarray(o2["final"])
print("max abs diff final:", np.abs(a - b).max())
for k in s1:
    d = jax.tree_util.tree_map(lambda x, y: float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))), s1[k], s2[k])
    mx = max(jax.tree_util.tree_leaves(d)) if jax.tree_util.tree_leaves(d) else 0.0
    if mx > 1e-6:
        print("state diff", k, mx)
print("OK" )
