"""Micro-benchmark: 2x2 phase weave (4 half-res planes -> full-res):
XLA stack+reshape vs MXU one-hot matmuls vs Pallas kernels."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 540, 960  # half-res planes -> (1080, 1920)

p = [jnp.asarray(np.random.rand(H, W), jnp.float32) for _ in range(4)]


def weave_xla(p00, p01, p10, p11):
    r0 = jnp.stack([p00, p01], axis=2)
    r1 = jnp.stack([p10, p11], axis=2)
    x = jnp.stack([r0, r1], axis=1)          # (H, 2, W, 2)
    return x.reshape(2 * H, 2 * W)


def _expand(n, parity):
    # (2n, n) one-hot: out[2i+parity, i] = 1
    r = jax.lax.broadcasted_iota(jnp.int32, (2 * n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (2 * n, n), 1)
    return (r == 2 * c + parity).astype(jnp.float32)


def weave_mxu(p00, p01, p10, p11):
    R = [_expand(H, 0), _expand(H, 1)]
    C = [_expand(W, 0), _expand(W, 1)]
    acc = None
    for py, row in ((0, (p00, p01)), (1, (p10, p11))):
        # row-expand once per input-parity pair after col-merge
        m = jnp.dot(row[0], C[0].T, preferred_element_type=jnp.float32) \
            + jnp.dot(row[1], C[1].T, preferred_element_type=jnp.float32)
        t = jnp.dot(R[py], m, preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    return acc


def _kern_reshape(a, b, c, d, o):
    bh, bw = a.shape
    r0 = jnp.stack([a[:], b[:]], axis=2).reshape(bh, 2 * bw)
    r1 = jnp.stack([c[:], d[:]], axis=2).reshape(bh, 2 * bw)
    o[:] = jnp.stack([r0, r1], axis=1).reshape(2 * bh, 2 * bw)


def make(kern, bw=128):
    grid = (W // bw,)
    spec_in = pl.BlockSpec((H, bw), lambda i: (0, i))
    spec_out = pl.BlockSpec((2 * H, 2 * bw), lambda i: (0, i))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2 * H, 2 * W), jnp.float32),
        grid=grid,
        in_specs=[spec_in] * 4,
        out_specs=spec_out,
    )


def bench(f, name, *args):
    jf = jax.jit(f)
    try:
        r = jf(*args)
        r.block_until_ready()
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")
        return None
    ref = np.asarray(jax.jit(weave_xla)(*p))
    if not np.allclose(np.asarray(r), ref):
        print(f"{name}: FAIL wrong output (excluded from comparison)")
        return None
    t0 = time.perf_counter()
    for _ in range(20):
        r = jf(*args)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{name}: ok=True {dt:.3f} ms")
    return dt


bench(weave_xla, "xla stack+reshape", *p)
bench(weave_mxu, "mxu one-hot matmul", *p)
bench(make(_kern_reshape), "pallas reshape", *p)


def _kern_mxu(a, b, c, d, o):
    bh, bw = a.shape
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    # lane interleave one-hots (bw, 2bw): S[j, 2j+px] = 1
    r = jax.lax.broadcasted_iota(jnp.int32, (bw, 2 * bw), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (bw, 2 * bw), 1)
    Sa = (cc == 2 * r).astype(f32)
    Sb = (cc == 2 * r + 1).astype(f32)
    top = jax.lax.dot_general(a[:], Sa, (((1,), (0,)), ((), ())),
                              precision=hp, preferred_element_type=f32) \
        + jax.lax.dot_general(b[:], Sb, (((1,), (0,)), ((), ())),
                              precision=hp, preferred_element_type=f32)
    bot = jax.lax.dot_general(c[:], Sa, (((1,), (0,)), ((), ())),
                              precision=hp, preferred_element_type=f32) \
        + jax.lax.dot_general(d[:], Sb, (((1,), (0,)), ((), ())),
                              precision=hp, preferred_element_type=f32)
    # row interleave one-hots (2bh, bh): R[2i+py, i] = 1
    rr = jax.lax.broadcasted_iota(jnp.int32, (2 * bh, bh), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (2 * bh, bh), 1)
    R0 = (rr == 2 * ci).astype(f32)
    R1 = (rr == 2 * ci + 1).astype(f32)
    o[:] = jax.lax.dot_general(R0, top, (((1,), (0,)), ((), ())),
                               precision=hp, preferred_element_type=f32) \
         + jax.lax.dot_general(R1, bot, (((1,), (0,)), ((), ())),
                               precision=hp, preferred_element_type=f32)


bench(make(_kern_mxu, bw=128), "pallas mxu one-hot", *p)
bench(make(_kern_mxu, bw=256), "pallas mxu one-hot bw256", *p)
