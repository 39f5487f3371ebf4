"""RMSE-vs-oracle convergence sweep on the textured cornell at 256x192:
prints rmse + non-emitter energy ratio at increasing hybrid frame counts
against a 256-spp PT oracle (diagnoses BENCH r5's 0.48@16f datum).

Run EXCLUSIVELY on the TPU: python tools/rmse_sweep.py
"""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np

from kajiya_tpu.core import jitcache

jitcache.enable()
from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.frame import (RenderConfig, init_frame_state,
                              init_reference_state, render_frame,
                              render_frame_reference)
from kajiya_tpu.ops.hoist import jit_hoisted
from kajiya_tpu.scene.procedural import textured_cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene

W, H = 256, 192
gpu = build_gpu_scene(textured_cornell_box())
ts, levels = build_trace_scene(gpu)
view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                           fov_y_deg=55.0, width=W, height=H)
cfg = RenderConfig(width=W, height=H, max_trace_steps=256,
                   use_taa=False, use_motion_blur=False)

t0 = time.time()
rstate = init_reference_state(cfg)
rstep = jit_hoisted(lambda s: render_frame_reference(
    ts, s, view, cfg, levels=levels, num_bounces=5, pixel_filter=False))
for _ in range(256):
    rstate, rout = rstep(rstate)
pt = np.asarray(rout["lit"])
print(f"oracle done ({time.time() - t0:.0f}s)  pt mean {pt.mean():.4f}",
      flush=True)

emit = pt.max(-1) > 3.0     # emissive quad + its specular spikes
state = init_frame_state(cfg)
step = jit_hoisted(lambda s: render_frame(ts, s, view, cfg, levels=levels))
marks = (16, 32, 64, 128, 256)
f = 0
for target in marks:
    while f < target:
        state, out = step(state)
        f += 1
    hy = np.asarray(out["lit"])
    rmse = float(np.sqrt(np.mean((hy - pt) ** 2)))
    rmse_ne = float(np.sqrt(np.mean((hy[~emit] - pt[~emit]) ** 2)))
    ratio = float(hy[~emit].mean() / pt[~emit].mean())
    print(f"frames {f:4d}: rmse {rmse:.4f}  rmse_nonemit {rmse_ne:.4f}  "
          f"nonemit energy ratio {ratio:.3f}", flush=True)
