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


def jit_hoisted(f, *ex_args):
    """jit(f) with every concrete array constant hoisted to a runtime arg."""
    cj, out_shape = jax.make_jaxpr(f, return_shape=True)(*ex_args)
    consts = [jnp.asarray(c) for c in cj.consts]
    flat_ex, in_tree = jax.tree_util.tree_flatten(ex_args)
    out_tree = jax.tree_util.tree_structure(out_shape)
    def g(consts, *args):
        flat, tree = jax.tree_util.tree_flatten(args)
        assert tree == in_tree, (tree, in_tree)
        out_flat = jax.core.eval_jaxpr(cj.jaxpr, consts, *flat)
        return jax.tree_util.tree_unflatten(out_tree, out_flat)
    jg = jax.jit(g)
    return (lambda *args: jg(consts, *args)), consts

from kajiya_tpu.sky.atmosphere import sky_radiance
h, w = 96, 128
d = jax.random.normal(key, (h, w, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
sun = jnp.asarray([0.3, 0.8, 0.5]); sun = sun / jnp.linalg.norm(sun)

probe("pre")
g, consts = jit_hoisted(lambda dd, s: sky_radiance(dd, s), d, sun)
print("hoisted:", [(np.asarray(c).shape, str(np.asarray(c).dtype)) for c in consts], flush=True)
out = g(d, sun); jax.block_until_ready(out)
t0 = time.perf_counter(); out = g(d, sun); jax.block_until_ready(out)
print(f"sky hoisted: {(time.perf_counter()-t0)*1e3:.3f} ms", flush=True)
probe("post")
