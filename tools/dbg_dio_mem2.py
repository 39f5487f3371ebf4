"""Decompose the diorama frame's 12 GB temp arena: memory_analysis of each
primary-path piece jitted alone. Run EXCLUSIVELY on the TPU."""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax

from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.renderers import gbuffer
from kajiya_tpu.scene.cache import load_mesh_cached
from kajiya_tpu.scene.scene import Scene, build_gpu_scene
from kajiya_tpu.world import build_trace_scene, refresh_trace_scene

W, H = 1920, 1080
scene = Scene()
scene.add_instance(scene.add_mesh(load_mesh_cached(
    "/root/reference/assets/meshes/pica_pica_-_mini_diorama_01/scene.gltf")),
    scale=(0.05, 0.05, 0.05))
gpu = build_gpu_scene(scene)
ts, levels = build_trace_scene(gpu)
view = make_view_constants((0.0, 0.6, 1.4), (0.0, -0.35, -1.0),
                           fov_y_deg=55.0, width=W, height=H)
tp = gpu.tex_pages
print("tex_pages:", None if tp is None else (tp.shape, tp.dtype),
      "tris:", int(gpu.num_triangles), flush=True)


def mem(tag, fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ma = c.memory_analysis()
    print(f"{tag}: temp {ma.temp_size_in_bytes / 1e9:.3f} GB  "
          f"code {ma.generated_code_size_in_bytes / 1e9:.3f} GB", flush=True)


from kajiya_tpu.renderers.raster import raster_hit
from kajiya_tpu.world import hit_attributes

mem("raster_hit (vis only)", lambda t: raster_hit(t, view, W, H).t, ts)
mem("raster_gbuffer (vis+attrs)",
    lambda t: gbuffer.raster_gbuffer(t, view, W, H)["albedo"], ts)


def attrs_only(t):
    hit = raster_hit(t, view, W, H)
    from kajiya_tpu.core.camera import camera_rays
    _, d = camera_rays(view, W, H)
    a = hit_attributes(t, hit, d.reshape(-1, 3), with_prev_pos=True)
    return a["base_color"]


mem("hit_attributes (after vis)", attrs_only, ts)
