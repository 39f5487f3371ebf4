import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HH, HW, C = 540, 960, 3
BH = 32


def _weave_kernel(p00, p01, p10, p11, out):
    a, b = p00[:, :], p01[:, :]
    c, d = p10[:, :], p11[:, :]
    bh, hw = a.shape
    r0 = jnp.stack([a, b], axis=2).reshape(bh, 2 * hw)
    r1 = jnp.stack([c, d], axis=2).reshape(bh, 2 * hw)
    out[:, :] = jnp.stack([r0, r1], axis=1).reshape(2 * bh, 2 * hw)


def weave2x2_pallas(p00, p01, p10, p11):
    hh0, hw = p00.shape
    ph = (-hh0) % BH
    if ph:
        p00, p01, p10, p11 = [jnp.pad(p, ((0, ph), (0, 0)))
                              for p in (p00, p01, p10, p11)]
    hh = hh0 + ph
    nb = hh // BH
    spec = pl.BlockSpec((BH, hw), lambda i: (i, 0))
    return pl.pallas_call(
        _weave_kernel,
        grid=(nb,),
        in_specs=[spec] * 4,
        out_specs=pl.BlockSpec((2 * BH, 2 * hw), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((2 * hh, 2 * hw), jnp.float32),
    )(p00, p01, p10, p11)[:2 * hh0]


def weave_xla(p00, p01, p10, p11):
    hh, hw = p00.shape
    x = jnp.stack([jnp.stack([p00, p01], 2), jnp.stack([p10, p11], 2)], 1)
    return x.reshape(2 * hh, 2 * hw)


def _split_kernel(img, o00, o01, o10, o11):
    x = img[:, :]
    bh2, hw2 = x.shape
    x = x.reshape(bh2 // 2, 2, hw2 // 2, 2)
    o00[:, :] = x[:, 0, :, 0]
    o01[:, :] = x[:, 0, :, 1]
    o10[:, :] = x[:, 1, :, 0]
    o11[:, :] = x[:, 1, :, 1]


def split2x2_pallas(img):
    h0, w = img.shape
    ph = (-(h0 // 2)) % BH * 2
    img = jnp.pad(img, ((0, ph), (0, 0))) if ph else img
    h = h0 + ph
    hh, hw = h // 2, w // 2
    nb = hh // BH
    ospec = pl.BlockSpec((BH, hw), lambda i: (i, 0))
    return pl.pallas_call(
        _split_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((2 * BH, w), lambda i: (i, 0))],
        out_specs=[ospec] * 4,
        out_shape=[jax.ShapeDtypeStruct((hh, hw), jnp.float32)] * 4,
    )(img)



def bench(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:28s} {dt:8.3f} ms")
    return out


k = jax.random.PRNGKey(0)
ps = [jax.random.normal(jax.random.PRNGKey(i), (HH, HW)) for i in range(4)]
full = jax.random.normal(k, (2 * HH, 2 * HW))

o1 = bench("weave_pallas", weave2x2_pallas, *ps)
o2 = bench("weave_xla", weave_xla, *ps)
print("weave equal:", jnp.array_equal(o1, o2))
s1 = bench("split_pallas", split2x2_pallas, full)
s2 = bench("split_xla", lambda x: [x[0::2, 0::2], x[0::2, 1::2], x[1::2, 0::2], x[1::2, 1::2]], full)
print("split equal:", all(jnp.array_equal(a, b) for a, b in zip(s1, s2)))

# 3-channel variants (channel loop outside)
bench("weave_pallas_3ch", lambda *a: jnp.stack(
    [weave2x2_pallas(*[x[..., c] for x in a]) for c in range(C)], -1),
    *[jax.random.normal(jax.random.PRNGKey(i), (HH, HW, C)) for i in range(4)])

