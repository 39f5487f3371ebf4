import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
import numpy as np

H, W = 1080, 1920
key = jax.random.PRNGKey(0)
img = jax.random.normal(key, (H, W, 4))
iy = jax.random.randint(key, (H, W), 0, H)
ix = jax.random.randint(key, (H, W), 0, W)

n = int(sys.argv[1])
mode = sys.argv[2] if len(sys.argv) > 2 else "gather"

if mode == "gather":
    def body(a, y, x):
        for _ in range(n):
            a = a.at[:, :, 0].set(a[y, x][:, :, 0])  # dependent chain of gathers
        return a
elif mode == "flat":
    imgf = img.reshape(-1, 4)
    fi = (iy * W + ix).reshape(-1)
    def body(a, y, x):
        b = img.reshape(-1, 4)
        for _ in range(n):
            b = b[fi] * 1.0001
        return b
elif mode == "mul":
    def body(a, y, x):
        for _ in range(n):
            a = a * 1.0001
        return a

g = jax.jit(body)
out = g(img, iy, ix)
jax.block_until_ready(out)
time.sleep(1)
t0 = time.perf_counter()
out = g(img, iy, ix)
v = float(np.asarray(out[0, 0]).reshape(-1)[0])
print(f"{mode} n={n}: {(time.perf_counter()-t0)*1e3:9.2f} ms", flush=True)
