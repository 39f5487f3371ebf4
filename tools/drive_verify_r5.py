"""Round-5 verify drive: textured cornell through the FULL hybrid frame on
CPU — exercises ray-cone LOD (textured fetches with per-ray mips), the
pre-exposure split, and the binned-raster primary, then writes a PNG to
eyeball. Fast enough for CPU (~2 min); the diorama variant of this drive is
tools/bench_diorama.py (TPU)."""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from PIL import Image
from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.frame import RenderConfig, init_frame_state, render_frame
from kajiya_tpu.scene.procedural import textured_cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene

gpu = build_gpu_scene(textured_cornell_box())
ts, levels = build_trace_scene(gpu)
W, H = 192, 144
view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                           fov_y_deg=55.0, width=W, height=H)
cfg = RenderConfig(width=W, height=H, max_trace_steps=256)
step = jax.jit(lambda s: render_frame(ts, s, view, cfg, levels=levels))
state = init_frame_state(cfg)
for i in range(6):
    state, out = step(state)
img = np.clip(np.asarray(out["final"]) * 255, 0, 255).astype(np.uint8)
Image.fromarray(img).save("/tmp/verify_r5.png")
print("pre_mult:", float(state["pre_mult"]), "ev:", float(state["smoothed_ev"]))
print("final mean:", img.mean(), "std:", img.std(),
      "finite:", bool(np.isfinite(np.asarray(out["final"])).all()))
