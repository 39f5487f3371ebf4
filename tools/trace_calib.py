import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
import numpy as np

H, W = 1080, 1920
key = jax.random.PRNGKey(0)
img = jax.random.normal(key, (H, W, 4))
fi = jax.random.randint(key, (H * W,), 0, H * W)
mm = jax.random.normal(key, (8192, 8192), jnp.bfloat16)

@jax.jit
def gstep(a):
    return (a.reshape(-1, 4)[fi] * 1.0001).reshape(H, W, 4)

@jax.jit
def mstep(a):
    return (a @ a) * jnp.bfloat16(1e-4)

a = gstep(img); m = mstep(mm)
jax.block_until_ready((a, m))
time.sleep(1)
with jax.profiler.trace("/tmp/jaxtrace_calib"):
    for _ in range(5):
        a = gstep(a)
    for _ in range(5):
        m = mstep(m)
    jax.block_until_ready((a, m))
    time.sleep(4)
print("done", flush=True)
