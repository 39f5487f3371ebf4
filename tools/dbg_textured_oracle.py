"""Render the textured-oracle triple once and save to npz for metric tuning."""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np
import jax

from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.frame import (RenderConfig, init_frame_state,
                              init_reference_state, render_frame,
                              render_frame_reference)
from kajiya_tpu.scene.procedural import textured_cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene

W, H = 64, 48

gpu = build_gpu_scene(textured_cornell_box())
ts, levels = build_trace_scene(gpu)
view = make_view_constants((0, 0, 2.4), (0, 0, -1), fov_y_deg=55.0,
                           width=W, height=H)


def hybrid(full):
    cfg = RenderConfig(width=W, height=H, max_trace_steps=256,
                       use_taa=False, use_motion_blur=False,
                       secondary_full_shading=full)
    state = init_frame_state(cfg)
    step = jax.jit(lambda s: render_frame(ts, s, view, cfg, levels=levels))
    for _ in range(16):
        state, out = step(state)
    return np.asarray(out["lit"])


cfg = RenderConfig(width=W, height=H, max_trace_steps=256,
                   use_taa=False, use_motion_blur=False)
rstate = init_reference_state(cfg)
rstep = jax.jit(lambda s: render_frame_reference(
    ts, s, view, cfg, levels=levels, num_bounces=5, pixel_filter=False))
for _ in range(48):
    rstate, rout = rstep(rstate)

np.savez("/tmp/textured_oracle.npz", pt=np.asarray(rout["lit"]),
         hy_full=hybrid(True), hy_flat=hybrid(False))
print("saved")
