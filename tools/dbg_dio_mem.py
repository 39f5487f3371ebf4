"""Compile (don't run) the diorama 1080p frame and print the TPU memory
analysis — diagnoses the RESOURCE_EXHAUSTED that wedged the r4 bench.

Run EXCLUSIVELY on the TPU: python tools/dbg_dio_mem.py [width] [height]
"""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax

from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.frame import RenderConfig, init_frame_state, render_frame
from kajiya_tpu.scene.cache import load_mesh_cached
from kajiya_tpu.scene.scene import Scene, build_gpu_scene
from kajiya_tpu.world import build_trace_scene

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080

SCENE = sys.argv[3] if len(sys.argv) > 3 else "diorama"
if SCENE == "cornell":
    from kajiya_tpu.scene.procedural import cornell_box

    gpu = build_gpu_scene(cornell_box())
elif SCENE == "city":
    from kajiya_tpu.scene.procedural import city

    gpu = build_gpu_scene(city(n=16, subdiv=8))
else:
    scene = Scene()
    scene.add_instance(scene.add_mesh(load_mesh_cached(
        "/root/reference/assets/meshes/pica_pica_-_mini_diorama_01/"
        "scene.gltf")), scale=(0.05, 0.05, 0.05))
    gpu = build_gpu_scene(scene)
print("tris:", int(gpu.num_triangles), flush=True)
ts, levels = build_trace_scene(gpu)
view = make_view_constants((0.0, 0.6, 1.4), (0.0, -0.35, -1.0),
                           fov_y_deg=55.0, width=W, height=H)
kw = {}
for flag in sys.argv[4:]:
    k, _, v = flag.partition("=")
    kw[k] = (v == "True") if v in ("True", "False") else (
        int(v) if v.isdigit() else v)
cfg = RenderConfig(width=W, height=H, **kw)
print("cfg overrides:", kw, flush=True)
state = init_frame_state(cfg)

fn = jax.jit(lambda s: render_frame(ts, s, view, cfg, levels=levels))
lowered = fn.lower(state)
print("lowered; compiling...", flush=True)
compiled = lowered.compile()
ma = compiled.memory_analysis()
print(ma, flush=True)
for attr in ("argument_size_in_bytes", "output_size_in_bytes",
             "temp_size_in_bytes", "generated_code_size_in_bytes",
             "alias_size_in_bytes"):
    v = getattr(ma, attr, None)
    if v is not None:
        print(f"{attr}: {v / 1e9:.3f} GB")
