import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np

key = jax.random.PRNGKey(0)
def probe(tag):
    H, W = 1080, 1920
    img = jnp.zeros((H, W, 4))
    iy = jax.random.randint(key, (H, W), 0, H)
    ix = jax.random.randint(key, (H, W), 0, W)
    g = jax.jit(lambda a, y, x: a[y, x] * 2.0)
    out = g(img, iy, ix); jax.block_until_ready(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); out = g(img, iy, ix); jax.block_until_ready(out)
        ts.append((time.perf_counter()-t0)*1e3)
    print(f"  [probe {tag:6s}] {np.median(ts):8.3f} ms", flush=True)

from kajiya_tpu.sky.atmosphere import sky_radiance
h, w = 96, 128
d = jax.random.normal(key, (h, w, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
sun = jnp.asarray([0.3, 0.8, 0.5]); sun = sun / jnp.linalg.norm(sun)

probe("pre")
f = lambda dd, s: sky_radiance(dd, s)
conv, consts = jax.closure_convert(f, d, sun)
print("hoisted consts:", [(np.asarray(c).shape, np.asarray(c).dtype) for c in consts], flush=True)
g = jax.jit(conv)
out = g(d, sun, *consts); jax.block_until_ready(out)
t0 = time.perf_counter(); out = g(d, sun, *consts); jax.block_until_ready(out)
print(f"sky hoisted: {(time.perf_counter()-t0)*1e3:.3f} ms", flush=True)
probe("post")
