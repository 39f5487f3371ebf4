import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
import jax; jax.config.update("jax_platforms", "cpu")
from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.frame import RenderConfig, init_frame_state
from kajiya_tpu.parallel import make_mesh, collective_summary, compile_frame_sharded
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene

gpu = build_gpu_scene(cornell_box())
ts, levels = build_trace_scene(gpu)
h, w = 128, 64
cfg = RenderConfig(width=w, height=h, max_trace_steps=256, use_motion_blur=False)
view = make_view_constants((0, 0, 2.4), (0, 0, -1), fov_y_deg=55.0, width=w, height=h)
mesh = make_mesh(8)
compiled = compile_frame_sharded(ts, init_frame_state(cfg), view, cfg, levels, mesh)
import json
print("SUMMARY:", json.dumps(collective_summary(compiled), indent=1))
text = compiled.as_text()
import re
# print the biggest all-gathers with context
for m in re.finditer(r"^.*= (all-gather|all-reduce)\(.*$", text, re.M):
    line = m.group(0)
    if len(line) > 300: line = line[:300]
    print(line)
