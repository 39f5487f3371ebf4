import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np

# known-cost program: 2M-row gather (device-true ~12.5 ms from trace)
H, W = 1080, 1920
key = jax.random.PRNGKey(0)
img = jax.random.normal(key, (H, W, 4))
fi = jax.random.randint(key, (H * W,), 0, H * W)

@jax.jit
def step(a):
    return (a.reshape(-1, 4)[fi] * 1.0001).reshape(H, W, 4)

a = step(img)
a = step(a)
jax.block_until_ready(a)
time.sleep(1)
n = int(sys.argv[1])
t0 = time.perf_counter()
for _ in range(n):
    a = step(a)
v = float(np.asarray(a[0, 0, 0]))
dt = (time.perf_counter() - t0) * 1e3
print(f"chain n={n}: total {dt:9.1f} ms  per-iter {dt/n:7.2f} ms", flush=True)
