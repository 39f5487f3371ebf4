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
probe("pre")
if which == "pallas_woop":
    from kajiya_tpu.scene.procedural import cornell_box
    from kajiya_tpu.scene.scene import build_gpu_scene
    from kajiya_tpu.world import build_trace_scene
    from kajiya_tpu.ops.woop_pallas import intersect_brute_pallas
    gpu = build_gpu_scene(cornell_box())
    ts_, levels = build_trace_scene(gpu)
    r = 128 * 96
    org = jnp.zeros((r, 3)) + jnp.asarray([0.0, 0.0, 2.4])
    d = jax.random.normal(key, (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    run("pallas woop 12k rays", lambda o, dd: intersect_brute_pallas(ts_.woop, o, dd)[0], org, d)
elif which == "pallas_woop2m":
    from kajiya_tpu.scene.procedural import cornell_box
    from kajiya_tpu.scene.scene import build_gpu_scene
    from kajiya_tpu.world import build_trace_scene
    from kajiya_tpu.ops.woop_pallas import intersect_brute_pallas
    gpu = build_gpu_scene(cornell_box())
    ts_, levels = build_trace_scene(gpu)
    r = 1920 * 1080
    org = jnp.zeros((r, 3)) + jnp.asarray([0.0, 0.0, 2.4])
    d = jax.random.normal(key, (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    run("pallas woop 2M rays", lambda o, dd: intersect_brute_pallas(ts_.woop, o, dd)[0], org, d)
elif which == "sh9":
    from kajiya_tpu.sky import env as env_mod
    sh = jax.random.normal(key, (9, 3))
    n = jax.random.normal(key, (96*128, 3))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    run("sh9 irradiance fetch", lambda s, nn: env_mod.sh9_irradiance_fn(s)(nn), sh, n)
elif which == "expo":
    from kajiya_tpu.renderers.post import exposure_from_histogram, luminance_histogram
    img = jnp.abs(jax.random.normal(key, (96, 128, 3)))
    run("histogram+exposure", lambda x: exposure_from_histogram(luminance_histogram(x)), img)
elif which == "deferred":
    from kajiya_tpu.renderers.post import post_combine
    img = jnp.abs(jax.random.normal(key, (96, 128, 3)))
    run("post_combine", lambda x: post_combine(x, jnp.float32(1.0)), img)
probe("post")
