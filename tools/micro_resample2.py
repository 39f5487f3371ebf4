"""Micro-bench v2: 2x resampling, device-honest timing.

Chains K iterations inside ONE jit via lax.scan (carry-dependent so nothing
is DCE'd); wall time / K then approximates device time regardless of tunnel
dispatch latency. Decimate is the point sample [::2, ::2] (what
core/img.decimate2 means); MXU variants use precision=HIGHEST so f32 data
survives (selection weights are exact in bf16; the x3-pass recovers data
precision).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from kajiya_tpu.core import img as im

H, W = 1080, 1920
K = 32
HP = jax.lax.Precision.HIGHEST


def chain(f, x0):
    def step(c, _):
        y = f(c)
        # re-inject a scalar of y into the next input to serialize
        return c * 0.0 + c + y.ravel()[0] * 1e-20, None

    def run(x):
        c, _ = jax.lax.scan(step, x, None, length=K)
        return c

    jf = jax.jit(run)
    jax.block_until_ready(jf(x0))
    t0 = time.perf_counter()
    jax.block_until_ready(jf(x0))
    return (time.perf_counter() - t0) / K * 1e3


def bench(name, f, x0, ref=None, atol=1e-5):
    try:
        r = jax.jit(f)(x0)
        jax.block_until_ready(r)
    except Exception as e:
        print(f"{name:36s} FAIL {type(e).__name__}: {str(e)[:80]}")
        return
    ok, md = True, 0.0
    if ref is not None:
        md = float(np.abs(np.asarray(r) - np.asarray(ref)).max())
        ok = md < atol
    dt = chain(f, x0)
    print(f"{name:36s} ok={ok} maxdiff={md:.2e} {dt:8.3f} ms")


def _sel_mat(n):
    r = jax.lax.broadcasted_iota(jnp.int32, (n // 2, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n // 2, n), 1)
    return (c == 2 * r).astype(jnp.float32)


def dec_mxu(x):
    dl = _sel_mat(x.shape[0])
    dr = _sel_mat(x.shape[1])
    if x.ndim == 3:
        t = jnp.einsum("hk,kwc->hwc", dl, x, precision=HP)
        return jnp.einsum("hwc,vw->hvc", t, dr, precision=HP)
    return jax.lax.dot(dl, jax.lax.dot(x, dr.T, precision=HP), precision=HP)


def dec_slice(x):
    return x[::2, ::2]


def _up_mat(n):
    r = jax.lax.broadcasted_iota(jnp.int32, (2 * n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (2 * n, n), 1)
    i = r // 2
    odd = (r % 2) == 1
    nb = jnp.clip(jnp.where(odd, i + 1, i - 1), 0, n - 1)
    m = jnp.where(c == i, 0.75, 0.0) + jnp.where(c == nb, 0.25, 0.0)
    # clamped edge rows coincide (i == nb): weight collapses to 1.0
    return jnp.where((i == nb) & (c == i), 1.0, m).astype(jnp.float32)


def up_mxu(x):
    ul = _up_mat(x.shape[0])
    ur = _up_mat(x.shape[1])
    if x.ndim == 3:
        t = jnp.einsum("hk,kwc->hwc", ul, x, precision=HP)
        return jnp.einsum("hwc,vw->hvc", t, ur, precision=HP)
    return jax.lax.dot(ul, jax.lax.dot(x, ur.T, precision=HP), precision=HP)


for shape, tag in (((H, W), "plane"), ((H, W, 3), "HW3")):
    x = jnp.asarray(np.random.rand(*shape).astype(np.float32))
    ref = jax.jit(im.decimate2)(x)
    print(f"--- decimate2 {tag}")
    bench("reshape+slice (current)", im.decimate2, x, ref=ref)
    bench("stride slice", dec_slice, x, ref=ref)
    bench("mxu one-hot HIGHEST", dec_mxu, x, ref=ref)

for shape, tag in (((H // 2, W // 2), "plane"), ((H // 2, W // 2, 3), "HW3")):
    xh = jnp.asarray(np.random.rand(*shape).astype(np.float32))
    refu = jax.jit(im.upsample2x_bilinear)(xh)
    print(f"--- upsample2x {tag}")
    bench("phase blend+interleave (current)", im.upsample2x_bilinear, xh,
          ref=refu)
    bench("mxu bilinear HIGHEST", up_mxu, xh, ref=refu)
