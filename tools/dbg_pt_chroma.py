"""PT oracle floor/wall chroma with and without the ray-cone LOD."""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np

from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.frame import (RenderConfig, init_reference_state,
                              render_frame_reference)
from kajiya_tpu.scene.procedural import textured_cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene
from kajiya_tpu.renderers import reference as refmod

W, H = 64, 48
gpu = build_gpu_scene(textured_cornell_box())
ts, levels = build_trace_scene(gpu)
view = make_view_constants((0, 0, 2.4), (0, 0, -1), fov_y_deg=55.0,
                           width=W, height=H)
cfg = RenderConfig(width=W, height=H, max_trace_steps=256,
                   use_taa=False, use_motion_blur=False)


def run(tag, patch_off):
    if patch_off:
        orig = refmod.render_sample

        def wrapped(*a, **k):
            k["cone_spread"] = None
            return orig(*a, **k)
        refmod.render_sample = wrapped
    try:
        rstate = init_reference_state(cfg)
        rstep = jax.jit(lambda s: render_frame_reference(
            ts, s, view, cfg, levels=levels, num_bounces=5,
            pixel_filter=False))
        for _ in range(48):
            rstate, rout = rstep(rstate)
        img = np.asarray(rout["lit"])
    finally:
        if patch_off:
            refmod.render_sample = orig
    cols = slice(W // 4, 3 * W // 4)
    floor_rb = img[-10:, cols, 0] - img[-10:, cols, 2]
    wall_rb = img[H // 2 - 8: H // 2, cols, 0] - img[H // 2 - 8: H // 2, cols, 2]
    print(f"{tag}: floor {floor_rb.std():.4f} wall {wall_rb.std():.4f} "
          f"ratio {floor_rb.std() / wall_rb.std():.2f}", flush=True)


run("cone LOD on ", False)
run("cone LOD off", True)
