"""Why did the textured-oracle wall chroma test regress with the footprint
resolve? Renders the textured cornell 16 frames with each resolve and
reports the test's floor/wall chroma stds + the rtr plane's wall stats."""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.frame import RenderConfig, init_frame_state, render_frame
from kajiya_tpu.renderers import rtr
from kajiya_tpu.scene.procedural import textured_cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene

W, H = 64, 48
gpu = build_gpu_scene(textured_cornell_box())
ts, levels = build_trace_scene(gpu)
view = make_view_constants((0, 0, 2.4), (0, 0, -1), fov_y_deg=55.0,
                           width=W, height=H)
cfg = RenderConfig(width=W, height=H, max_trace_steps=256,
                   use_taa=False, use_motion_blur=False)


def run(tag):
    step = jax.jit(lambda s: render_frame(ts, s, view, cfg, levels=levels))
    state = init_frame_state(cfg)
    for _ in range(16):
        state, out = step(state)
    img = np.asarray(out["lit"])
    spec = np.asarray(out.get("rtr", np.zeros_like(img)))
    cols = slice(W // 4, 3 * W // 4)
    floor_rb = img[-10:, cols, 0] - img[-10:, cols, 2]
    wall_rb = img[H // 2 - 8: H // 2, cols, 0] - img[H // 2 - 8: H // 2, cols, 2]
    srb = spec[H // 2 - 8: H // 2, cols, 0] - spec[H // 2 - 8: H // 2, cols, 2]
    print(f"{tag}: floor_rb.std {floor_rb.std():.4f}  wall_rb.std "
          f"{wall_rb.std():.4f}  ratio {floor_rb.std() / wall_rb.std():.2f}  "
          f"rtr wall rb.std {srb.std():.4f} mean {spec.mean():.4f}",
          flush=True)


run("footprint")
orig = rtr._resolve_footprint
rtr._resolve_footprint = (
    lambda res, spec_h, rl, gb, view, near=0.01: rtr._resolve_full(
        spec_h, rl, gb, near))
try:
    run("legacy 4-tap")
finally:
    rtr._resolve_footprint = orig
