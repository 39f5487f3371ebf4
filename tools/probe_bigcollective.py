"""Find the collectives that trip check_sharding_quality at the dryrun
shape (128x64, 8-way row sharding): print kind, result bytes, and op_name
for every collective above one plane. CPU-only."""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import re

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")

from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.frame import RenderConfig, init_frame_state
from kajiya_tpu.parallel import make_mesh
from kajiya_tpu.parallel.mesh import _sharded_step, check_sharding_quality
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene

H, W = 128, 64
gpu = build_gpu_scene(cornell_box())
ts, levels = build_trace_scene(gpu)
cfg = RenderConfig(width=W, height=H, max_trace_steps=256)
view = make_view_constants((0, 0, 2.4), (0, 0, -1), fov_y_deg=55.0,
                           width=W, height=H)
mesh = make_mesh(8)
fn, args = _sharded_step(ts, init_frame_state(cfg), view, cfg, levels, mesh)
print("lowering/compiling...", flush=True)
compiled = fn.lower(*args).compile()
summary, problems = check_sharding_quality(compiled, H, W)
print("problems:", problems, flush=True)

_elem_bytes = {"f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4, "u32": 4,
               "bf16": 2, "f16": 2, "s16": 2, "u16": 2, "pred": 1,
               "s8": 1, "u8": 1}
_shape = re.compile(r"(\w+)\[([\d,]*)\]")
plane = H * W * 4
for line in compiled.as_text().splitlines():
    m = re.search(r"=\s*(\([^)]*\)|\S+)\s+(all-gather|all-reduce|"
                  r"collective-permute|all-to-all|reduce-scatter)\(", line)
    if not m:
        continue
    result_ty, kind = m.group(1), m.group(2)
    nbytes = 0
    for dtype, dims in _shape.findall(result_ty):
        n = 1
        for dpart in dims.split(","):
            if dpart:
                n *= int(dpart)
        nbytes += n * _elem_bytes.get(dtype, 4)
    if nbytes <= plane:
        continue
    op = re.search(r'op_name="([^"]*)"', line)
    src = re.search(r'source_file="([^"]*)"[^"]*source_line=(\d+)', line)
    print(f"{kind:20s} {nbytes/plane:7.1f} planes  {result_ty[:60]:62s} "
          f"{op.group(1)[:90] if op else '?'}"
          f"  @{src.group(1).rsplit('/',1)[-1]}:{src.group(2) if src else '?'}"
          if src else
          f"{kind:20s} {nbytes/plane:7.1f} planes  {result_ty[:60]:62s} "
          f"{op.group(1)[:110] if op else '?'}",
          flush=True)
