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
    cj, out_shape = jax.make_jaxpr(f, return_shape=True)(*ex_args)
    consts = [jnp.asarray(c) for c in cj.consts]
    out_tree = jax.tree_util.tree_structure(out_shape)
    def g(consts, *args):
        flat, _ = jax.tree_util.tree_flatten(args)
        out_flat = jax.core.eval_jaxpr(cj.jaxpr, consts, *flat)
        return jax.tree_util.tree_unflatten(out_tree, out_flat)
    jg = jax.jit(g)
    return lambda *args: jg(consts, *args)

def run(name, f, *a, hoist=True):
    g = jit_hoisted(f, *a) if hoist else jax.jit(f)
    out = g(*a); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = g(*a); jax.block_until_ready(out)
    print(f"{name:52s} {(time.perf_counter()-t0)*1e3:8.3f} ms", flush=True)

which = sys.argv[1]
h, w = 96, 128
x2d = jnp.abs(jax.random.normal(key, (h, w))) + 0.1
sun = jnp.asarray([0.3, 0.8, 0.5]); sun = sun / jnp.linalg.norm(sun)
from kajiya_tpu.sky import atmosphere as at

probe("pre")
if which == "argslice":
    run("x2d * s[1] (arg slice)", lambda x, s: x * s[1], x2d, sun)
elif which == "nosun_h":
    def f(dd):
        r0 = at.EARTH_RADIUS + 200.0
        mu = jnp.clip(dd[..., 1], -1.0, 1.0)
        dist = at._ray_sphere_exit(jnp.full_like(mu, r0), jnp.maximum(mu, -0.03))
        ds = dist / 12
        accum = jnp.zeros(dd.shape[:-1] + (3,))
        od_r = jnp.zeros(dd.shape[:-1])
        for i in range(12):
            t = (i + 0.5) * ds
            r = jnp.sqrt(jnp.maximum(r0*r0 + t*t + 2.0*r0*t*mu, 1.0))
            hh = r - at.EARTH_RADIUS
            dr, dm = at._densities(hh)
            od_r = od_r + dr * ds
            tau = at.BETA_RAYLEIGH * od_r[..., None]
            accum = accum + jnp.exp(-tau) * (dr * ds)[..., None]
        return accum
    d3 = jax.random.normal(key, (h, w, 3)); d3 = d3 / jnp.linalg.norm(d3, axis=-1, keepdims=True)
    run("march no-sun hoisted", f, d3)
elif which == "odts_h":
    r = jnp.full((h, w), at.EARTH_RADIUS + 1000.0)
    mu = jnp.full((h, w), 0.7)
    run("odts hoisted", lambda rr, m: at._optical_depth_to_sun(rr, rr - at.EARTH_RADIUS, m)[0], r, mu)
elif which == "sky_h_again":
    d3 = jax.random.normal(key, (h, w, 3)); d3 = d3 / jnp.linalg.norm(d3, axis=-1, keepdims=True)
    run("full sky_radiance hoisted", lambda dd, s: at.sky_radiance(dd, s), d3, sun)
elif which == "sky_h_nophase":
    d3 = jax.random.normal(key, (h, w, 3)); d3 = d3 / jnp.linalg.norm(d3, axis=-1, keepdims=True)
    def f(dd, s):
        from kajiya_tpu.ops.smallvec import dot3
        r0 = at.EARTH_RADIUS + 200.0
        mu = jnp.clip(dd[..., 1], -1.0, 1.0)
        dist = at._ray_sphere_exit(jnp.full_like(mu, r0), jnp.maximum(mu, -0.03))
        ds = dist / 12
        accum_r = jnp.zeros(dd.shape[:-1] + (3,))
        accum_m = jnp.zeros(dd.shape[:-1] + (3,))
        od_r = jnp.zeros(dd.shape[:-1]); od_m = jnp.zeros(dd.shape[:-1])
        mu_s = s[1]
        for i in range(12):
            t = (i + 0.5) * ds
            r = jnp.sqrt(jnp.maximum(r0*r0 + t*t + 2.0*r0*t*mu, 1.0))
            hh = r - at.EARTH_RADIUS
            dr, dm = at._densities(hh)
            od_r = od_r + dr * ds; od_m = od_m + dm * ds
            sr, sm = at._optical_depth_to_sun(r, hh, jnp.broadcast_to(mu_s, r.shape))
            tau = (at.BETA_RAYLEIGH * (od_r + sr)[..., None]
                   + (at.BETA_MIE + at.BETA_MIE_ABS) * (od_m + sm)[..., None])
            trans = jnp.exp(-tau)
            accum_r = accum_r + trans * (dr * ds)[..., None]
            accum_m = accum_m + trans * (dm * ds)[..., None]
        return accum_r + accum_m
    run("sky full march, no phases/tail", f, d3, sun)
probe("post")
