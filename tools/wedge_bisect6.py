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

from kajiya_tpu.ops.hoist import jit_hoisted

def run(name, f, *a):
    g = jit_hoisted(f)
    out = g(*a); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = g(*a); jax.block_until_ready(out)
    print(f"{name:52s} {(time.perf_counter()-t0)*1e3:8.3f} ms", flush=True)

which = sys.argv[1]
H, W = 288, 512
probe("pre")
if which == "passthru":
    x = jnp.abs(jax.random.normal(key, (H, W, 3)))
    y = jnp.zeros((H, W))
    run("return (exp(x), y-passthrough)", lambda a, b: (jnp.exp(-a), b), x, y)
elif which == "bigstate":
    st = {f"k{i}": jnp.zeros((H, W)) for i in range(30)}
    def f(s):
        return {k: v + 1.0 for k, v in s.items()}
    run("30-array state round-trip", f, st)
elif which == "bigout":
    x = jnp.abs(jax.random.normal(key, (H, W, 3)))
    def f(a):
        return {f"o{i}": a * (i + 1.0) for i in range(15)}
    run("15 big outputs", f, x)
elif which == "mixdtype":
    st = {"a": jnp.zeros((H, W)), "b": jnp.zeros((H, W), jnp.int32),
          "c": jnp.zeros((H, W), jnp.bool_), "i": jnp.asarray(0, jnp.int32)}
    def f(s):
        return {"a": s["a"] + 1, "b": s["b"] + 1, "c": ~s["c"], "i": s["i"] + 1}
    run("mixed dtype state", f, st)
probe("post")
