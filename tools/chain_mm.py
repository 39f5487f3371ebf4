import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np

N = 8192
key = jax.random.PRNGKey(0)
a0 = jax.random.normal(key, (N, N), jnp.bfloat16)

@jax.jit
def step(a):
    return (a @ a) * jnp.bfloat16(1e-4)

a = step(a0); a = step(a); jax.block_until_ready(a)
time.sleep(1)
n = int(sys.argv[1])
t0 = time.perf_counter()
for _ in range(n):
    a = step(a)
v = float(np.asarray(a[0, 0]))
dt = (time.perf_counter() - t0) * 1e3
print(f"mm chain n={n}: total {dt:9.1f} ms  per-iter {dt/n:7.2f} ms  (1.1 TFLOP/it)", flush=True)
