"""temp_size scaling of intersect_culled_pallas alone: vs ray count and vs
rb, to find the hidden 7.5 GB in the diorama visibility pass.

Run EXCLUSIVELY on the TPU."""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from kajiya_tpu.ops.woop_pallas import intersect_culled_pallas
from kajiya_tpu.scene.cache import load_mesh_cached
from kajiya_tpu.scene.scene import Scene, build_gpu_scene
from kajiya_tpu.world import build_trace_scene

scene = Scene()
scene.add_instance(scene.add_mesh(load_mesh_cached(
    "/root/reference/assets/meshes/pica_pica_-_mini_diorama_01/scene.gltf")),
    scale=(0.05, 0.05, 0.05))
gpu = build_gpu_scene(scene)
ts, levels = build_trace_scene(gpu)
woop = ts.woop
rng = np.random.default_rng(0)


def mem(tag, R, rb):
    org = jnp.asarray(rng.random((R, 3), np.float32) * 4 - 2)
    d = rng.standard_normal((R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    c = jax.jit(lambda o, dd: intersect_culled_pallas(
        woop, o, dd, rb=rb)[0]).lower(org, d).compile()
    ma = c.memory_analysis()
    print(f"{tag}: R={R} rb={rb} temp {ma.temp_size_in_bytes / 1e9:.3f} GB",
          flush=True)


mem("small", 1 << 19, 512)
mem("big  ", 1 << 21, 512)
mem("big/128", 1 << 21, 128)
