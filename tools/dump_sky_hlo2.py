import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import re
import numpy as np
from kajiya_tpu.sky.atmosphere import sky_radiance

key = jax.random.PRNGKey(0)
h, w = 96, 128
d = jax.random.normal(key, (h, w, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
sun = jnp.asarray([0.3, 0.8, 0.5]); sun = sun / jnp.linalg.norm(sun)

def jit_hoisted(f, *ex_args):
    cj, out_shape = jax.make_jaxpr(f, return_shape=True)(*ex_args)
    consts = [jnp.asarray(c) for c in cj.consts]
    flat_ex, in_tree = jax.tree_util.tree_flatten(ex_args)
    out_tree = jax.tree_util.tree_structure(out_shape)
    def g(consts, *args):
        flat, tree = jax.tree_util.tree_flatten(args)
        out_flat = jax.core.eval_jaxpr(cj.jaxpr, consts, *flat)
        return jax.tree_util.tree_unflatten(out_tree, out_flat)
    return jax.jit(g), consts

jg, consts = jit_hoisted(lambda dd, s: sky_radiance(dd, s), d, sun)
txt = jg.lower(consts, d, sun).compile().as_text()
open("/tmp/hlo_sky_hoisted.txt", "w").write(txt)
# array-shaped constants in the optimized module
for m in re.finditer(r"constant\.\d+ = \w+\[[0-9,]+\][^ ]* constant", txt):
    print(m.group(0))
print("---- S(1) mentions:", len(re.findall(r"S\(1\)", txt)))
for line in txt.splitlines():
    if "S(1)" in line and "=" in line:
        print(line.strip()[:160])
