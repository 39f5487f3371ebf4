"""A/B the RTR resolve kernels on a GLOSSY cornell (metallic boxes,
roughness 0.3): converged hybrid frames vs a PT oracle, RMSE per resolve.

VERDICT r4 #7: the BRDF-lobe footprint resolve must beat the old 4-tap
joint-bilateral on a glossy scene. CPU run: ~3 min.

    PALLAS_AXON_POOL_IPS= python tools/ab_rtr_resolve.py [roughness]
"""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.frame import (RenderConfig, init_frame_state,
                              init_reference_state, render_frame,
                              render_frame_reference)
from kajiya_tpu.renderers import rtr
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene

ROUGH = float(sys.argv[1]) if len(sys.argv) > 1 else 0.3
W, H = 128, 96
FRAMES, ORACLE_SPP = 24, 192

gpu = build_gpu_scene(cornell_box(box_metallic=1.0, box_roughness=ROUGH))
ts, levels = build_trace_scene(gpu)
view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                           fov_y_deg=55.0, width=W, height=H)
cfg = RenderConfig(width=W, height=H, max_trace_steps=256,
                   use_motion_blur=False, use_taa=False)

rstate = init_reference_state(cfg)
rstep = jax.jit(lambda s: render_frame_reference(
    ts, s, view, cfg, levels=levels, num_bounces=5, pixel_filter=False))
for _ in range(ORACLE_SPP):
    rstate, rout = rstep(rstate)
pt = np.asarray(rout["lit"])
print(f"oracle done ({ORACLE_SPP} spp), mean {pt.mean():.4f}", flush=True)


def run_hybrid(tag):
    step = jax.jit(lambda s: render_frame(ts, s, view, cfg, levels=levels))
    state = init_frame_state(cfg)
    for _ in range(FRAMES):
        state, out = step(state)
    hy = np.asarray(out["lit"])
    rmse = float(np.sqrt(np.mean((hy - pt) ** 2)))
    print(f"{tag}: rmse {rmse:.4f}  (mean {hy.mean():.4f})", flush=True)
    return rmse


new = run_hybrid("footprint resolve")

# legacy 4-tap joint-bilateral, monkeypatched in place of the footprint


def _legacy(res_planes, spec_h, ray_len_h, gb, view, near=0.01):
    return rtr._resolve_full(spec_h, ray_len_h, gb, near)


orig = rtr._resolve_footprint
rtr._resolve_footprint = _legacy
try:
    old = run_hybrid("4-tap bilateral")
finally:
    rtr._resolve_footprint = orig
print(f"gain: {old / max(new, 1e-9):.3f}x (roughness {ROUGH})")
