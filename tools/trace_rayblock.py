import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
import numpy as np
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene
from kajiya_tpu.ops import woop_pallas

R = 1920 * 1080
key = jax.random.PRNGKey(0)
gpu = build_gpu_scene(cornell_box())
ts_, _ = build_trace_scene(gpu)
org = jnp.zeros((R, 3)) + jnp.asarray([0.0, 0.0, 2.4])
d = jax.random.normal(key, (R, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

fns = []
for rb in (512, 1024, 2048, 4096):
    woop_pallas.RAY_BLOCK = rb
    f = jax.jit(lambda o, dd, rb=rb: woop_pallas.intersect_brute_pallas(
        ts_.woop, o, dd)[0] + rb)
    out = f(org, d); jax.block_until_ready(out)
    fns.append((rb, f))
time.sleep(1)
with jax.profiler.trace("/tmp/jaxtrace_rb"):
    for rb, f in fns:
        out = f(org, d)
    jax.block_until_ready(out)
    time.sleep(3)
print("done", flush=True)
