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

def run(name, f, *a):
    g = jax.jit(f)
    out = g(*a); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = g(*a); jax.block_until_ready(out)
    print(f"{name:52s} {(time.perf_counter()-t0)*1e3:8.3f} ms", flush=True)

which = sys.argv[1]
h, w = 96, 128
x2d = jnp.abs(jax.random.normal(key, (h, w))) + 0.1
x3d = jnp.abs(jax.random.normal(key, (h, w, 3))) + 0.1
c3 = jnp.asarray([1.1, 2.2, 3.3])

probe("pre")
if which == "exp3":
    run("exp on (h,w,3) input", lambda x: jnp.exp(-x), x3d)
elif which == "bcast3_exp":
    run("(h,w,1)*(3,) -> exp", lambda x: jnp.exp(-x[..., None] * c3), x2d)
elif which == "iota4_sum":
    t4 = jnp.arange(4, dtype=jnp.float32) + 0.5
    run("(h,w,1)*(4,) -> sum(-1)", lambda x: (x[..., None] * t4).sum(-1), x2d)
elif which == "tuple2":
    run("tuple of two 2d exps", lambda x: (jnp.exp(-x), jnp.exp(-2*x)), x2d)
elif which == "odts_single":
    from kajiya_tpu.sky import atmosphere as at
    r = jnp.full((h, w), at.EARTH_RADIUS + 1000.0)
    mu = jnp.full((h, w), 0.7)
    run("odts first output only", lambda rr, m: at._optical_depth_to_sun(rr, rr - at.EARTH_RADIUS, m)[0], r, mu)
elif which == "sqrt_big":
    r = jnp.full((h, w), 6.36e6)
    run("sqrt(r*r + t) big consts", lambda rr: jnp.sqrt(jnp.maximum(rr*rr + 1.0, 1.0)) - 6.36e6, r)
elif which == "bcast3_mul":
    run("(h,w,1)*(3,) no exp", lambda x: x[..., None] * c3, x2d)
elif which == "mask_mul":
    run("(h,w,1) * (h,w,3) big-big", lambda m, x: m[..., None] * x, x2d, x3d)
elif which == "c3_mul_big":
    run("(3,) * (h,w,3)", lambda x: c3 * x, x3d)
elif which == "add_c3":
    run("(h,w,1) + (3,)", lambda x: x[..., None] + c3, x2d)
elif which == "where_mask":
    run("where((h,w,1), (h,w,3), (h,w,3))", lambda m, x: jnp.where(m[..., None] > 0.5, x, x * 2.0), x2d, x3d)
elif which == "bto":
    run("broadcast_to (h,w,1)->(h,w,3)", lambda x: jnp.broadcast_to(x[..., None], (x.shape[0], x.shape[1], 3)) + 0.0, x2d)
elif which == "scalar0d":
    run("(h,w) * c3[1] 0-d slice", lambda x: x * c3[1], x2d)
elif which == "arg3_mul":
    run("(h,w,1) * (3,) as ARG", lambda x, c: x[..., None] * c, x2d, c3)
elif which == "k2_mul":
    c2 = jnp.asarray([1.1, 2.2])
    run("(h,w,1) * (2,)", lambda x: x[..., None] * c2, x2d)
elif which == "stack_0d":
    run("stack([x*c[i]]) 0-d slices", lambda x: jnp.stack([x * c3[0], x * c3[1], x * c3[2]], -1), x2d)
elif which == "litmul3":
    run("stack([x*lit]) python literals", lambda x: jnp.stack([x * 0.2126, x * 0.7152, x * 0.0722], -1), x2d)
elif which == "iota_mul":
    run("(h,w,1) * lax.iota(4)", lambda x: x[..., None] * (jax.lax.iota(jnp.float32, 4) + 0.5), x2d)
elif which == "bigconst":
    import numpy as _np
    C = jnp.asarray(_np.random.RandomState(0).randn(96, 128).astype(_np.float32))
    run("x + bigconst (96,128)", lambda x: x + C, x2d)
elif which == "bigconst1080":
    import numpy as _np
    C2 = jnp.asarray(_np.random.RandomState(0).randn(1080, 1920).astype(_np.float32))
    x9 = jnp.zeros((1080, 1920))
    run("x + bigconst (1080,1920)", lambda x: x + C2, x9)
elif which == "halton_gather":
    import numpy as _np
    Hal = jnp.asarray(_np.random.RandomState(0).rand(128, 2).astype(_np.float32))
    run("const(128,2)[i%128] gather", lambda i: Hal[i % 128], jnp.asarray(5, jnp.int32))
elif which == "sum3":
    run("(h,w,3).sum(-1)", lambda x: x.sum(-1), x3d)
elif which == "sum4":
    x4 = jnp.abs(jax.random.normal(key, (h, w, 4)))
    run("(h,w,4).sum(-1)", lambda x: x.sum(-1), x4)
elif which == "sum3_unroll":
    run("x0+x1+x2 slices", lambda x: x[..., 0] + x[..., 1] + x[..., 2], x3d)
elif which == "max3":
    run("(h,w,3).max(-1)", lambda x: x.max(-1), x3d)
elif which == "norm3":
    run("linalg.norm (h,w,3)", lambda x: jnp.linalg.norm(x, axis=-1), x3d)
elif which == "stack3":
    run("stack 3x 2d exps", lambda x: jnp.stack([jnp.exp(-x), jnp.exp(-2*x), jnp.exp(-3*x)], -1), x2d)
probe("post")
