import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
import numpy as np
from kajiya_tpu.core import img as im
from kajiya_tpu.ops.warp_pallas import warp2d_pallas
from kajiya_tpu.ops.hoist import jit_hoisted

H, W = 1080, 1920
key = jax.random.PRNGKey(0)
img4 = jax.random.normal(key, (H, W, 4))
img1 = img4[..., 0]
uv = im.pixel_uv(H, W) + (jax.random.uniform(key, (H, W, 2)) * 2 - 1) * jnp.asarray([8.0 / W, 8.0 / H])

f_bi = jit_hoisted(lambda a, u: warp2d_pallas(a, u, bilinear=True))  # fast default
f_nn = jit_hoisted(lambda a, u: warp2d_pallas(a, u, bilinear=False))
f_bi1 = jit_hoisted(lambda a, u: warp2d_pallas(a, u, bilinear=True))
o1 = f_bi(img4, uv); o2 = f_nn(img4, uv); o3 = f_bi1(img1, uv)
jax.block_until_ready((o1, o2, o3))
# correctness on-chip
ref = im.sample_bilinear(img4, uv)
err = float(jnp.max(jnp.abs(o1 - ref)))
print("max err vs XLA sampler:", err, flush=True)
time.sleep(1)
with jax.profiler.trace("/tmp/jaxtrace_warp"):
    o1 = f_bi(img4, uv)
    o2 = f_nn(img4, uv)
    o3 = f_bi1(img1, uv)
    jax.block_until_ready((o1, o2, o3))
    time.sleep(3)
print("done", flush=True)
