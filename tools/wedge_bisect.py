import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np

H, W = 1080, 1920
key = jax.random.PRNGKey(0)

def probe(tag):
    img = jnp.zeros((H, W, 4))
    iy = jax.random.randint(key, (H, W), 0, H)
    ix = jax.random.randint(key, (H, W), 0, W)
    g = jax.jit(lambda a, y, x: a[y, x] * 2.0)
    out = g(img, iy, ix); jax.block_until_ready(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); out = g(img, iy, ix); jax.block_until_ready(out)
        ts.append((time.perf_counter()-t0)*1e3)
    print(f"  [probe {tag:24s}] {np.median(ts):8.3f} ms", flush=True)

def run(name, f, *a):
    g = jax.jit(f)
    out = g(*a); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = g(*a); jax.block_until_ready(out)
    print(f"{name:52s} {(time.perf_counter()-t0)*1e3:8.3f} ms", flush=True)

which = sys.argv[1]
h, w = 96, 128
d = jax.random.normal(key, (h, w, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
sun = jnp.asarray([0.3, 0.8, 0.5]); sun = sun / jnp.linalg.norm(sun)

probe("pre")
if which == "sky_full":
    from kajiya_tpu.sky.atmosphere import sky_radiance
    run("sky_radiance steps=12", lambda dd: sky_radiance(dd, sun), d)
elif which == "sky_nosun":
    # main march without _optical_depth_to_sun
    from kajiya_tpu.sky import atmosphere as at
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
    run("sky march no-sun-depth", f, d)
elif which == "odts":
    from kajiya_tpu.sky import atmosphere as at
    r = jnp.full((h, w), at.EARTH_RADIUS + 1000.0)
    run("_optical_depth_to_sun", lambda rr: at._optical_depth_to_sun(rr, rr, jnp.broadcast_to(sun[1], rr.shape))[0], r)
elif which == "phase":
    from kajiya_tpu.sky import atmosphere as at
    c = d[..., 1]
    run("phase_mie pow1.5", lambda cc: at._phase_mie(cc), c)
elif which == "exp_chain":
    x = jnp.abs(d[..., 0])
    def f(xx):
        acc = xx
        for i in range(50):
            acc = jnp.exp(-acc) + 0.1
        return acc
    run("50 chained exps small", f, x)
elif which == "bigmm":
    a = jax.random.normal(key, (4096, 4096))
    run("matmul 4096^3 (~34ms?)", lambda x: x @ x, a)
elif which == "bigmm_loop":
    a = jax.random.normal(key, (2048, 2048))
    def f(x):
        for _ in range(20):
            x = x @ x * 1e-3
        return x
    run("20x matmul 2048^3", f, a)
probe("post")
