"""Micro-bench: 2x down/up-sampling formulations on TPU.

The 1080p frame spends ~98 ms in data-formatting HLO, dominated by
(H/2, 2, W/2, 2) phase-interleave reshapes from decimate2/upsample2x.
Candidates to replace them:
  - reshape+mean (current decimate2)
  - lax.reduce_window mean
  - MXU: D @ X @ D^T with 0.25 two-hot averaging matrices
  - upsample: current phase-blend+interleave vs MXU U @ X @ U^T bilinear
Run EXCLUSIVELY on the TPU.
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
x = jnp.asarray(np.random.rand(H, W).astype(np.float32))
x3 = jnp.asarray(np.random.rand(H, W, 3).astype(np.float32))
xh = jnp.asarray(np.random.rand(H // 2, W // 2).astype(np.float32))
xh3 = jnp.asarray(np.random.rand(H // 2, W // 2, 3).astype(np.float32))


def bench(name, f, *args, ref=None, atol=1e-4):
    jf = jax.jit(f)
    try:
        r = jf(*args)
        jax.block_until_ready(r)
    except Exception as e:
        print(f"{name:34s} FAIL {type(e).__name__}: {str(e)[:90]}")
        return
    ok = True
    if ref is not None:
        ok = bool(np.allclose(np.asarray(r), np.asarray(ref), atol=atol))
    t0 = time.perf_counter()
    for _ in range(30):
        r = jf(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 30 * 1e3
    print(f"{name:34s} ok={ok} {dt:8.3f} ms")
    return dt


def dec_reshape(x):
    return im.decimate2(x)


def dec_rw(x):
    if x.ndim == 3:
        r = jax.lax.reduce_window(x, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1),
                                  "VALID")
    else:
        r = jax.lax.reduce_window(x, 0.0, jax.lax.add, (2, 2), (2, 2),
                                  "VALID")
    return r * 0.25


def _dec_mat(n):
    # (n/2, n) two-hot 0.5-averaging
    r = jax.lax.broadcasted_iota(jnp.int32, (n // 2, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n // 2, n), 1)
    return ((c == 2 * r) | (c == 2 * r + 1)).astype(jnp.float32) * 0.5


def dec_mxu(x):
    dl = _dec_mat(x.shape[0])
    dr = _dec_mat(x.shape[1])
    if x.ndim == 3:
        t = jnp.einsum("hk,kwc->hwc", dl, x)
        return jnp.einsum("hwc,vw->hvc", t, dr)
    return dl @ x @ dr.T


def up_current(x):
    return im.upsample2x_bilinear(x)


def _up_mat(n):
    # (2n, n) bilinear: out[2i] = .75 in[i] + .25 in[i-1]; out[2i+1] = .75 in[i] + .25 in[i+1]
    r = jax.lax.broadcasted_iota(jnp.int32, (2 * n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (2 * n, n), 1)
    i = r // 2
    odd = (r % 2) == 1
    nb = jnp.clip(jnp.where(odd, i + 1, i - 1), 0, n - 1)
    return (jnp.where(c == i, 0.75, 0.0)
            + jnp.where(c == nb, 0.25, 0.0)).astype(jnp.float32)


def up_mxu(x):
    ul = _up_mat(x.shape[0])
    ur = _up_mat(x.shape[1])
    if x.ndim == 3:
        t = jnp.einsum("hk,kwc->hwc", ul, x)
        return jnp.einsum("hwc,vw->hvc", t, ur)
    return ul @ x @ ur.T


ref1 = jax.jit(dec_reshape)(x)
ref3 = jax.jit(dec_reshape)(x3)
print("--- decimate2 (1080p -> 540p), single plane")
bench("reshape+mean (current)", dec_reshape, x, ref=ref1)
bench("reduce_window", dec_rw, x, ref=ref1)
bench("mxu two-hot", dec_mxu, x, ref=ref1)
print("--- decimate2, (H, W, 3)")
bench("reshape+mean (current)", dec_reshape, x3, ref=ref3)
bench("reduce_window", dec_rw, x3, ref=ref3)
bench("mxu two-hot", dec_mxu, x3, ref=ref3)
refu = jax.jit(up_current)(xh)
refu3 = jax.jit(up_current)(xh3)
print("--- upsample2x (540p -> 1080p), single plane")
bench("phase blend+interleave (current)", up_current, xh, ref=refu)
bench("mxu bilinear", up_mxu, xh, ref=refu)
print("--- upsample2x, (H, W, 3)")
bench("phase blend+interleave (current)", up_current, xh3, ref=refu3)
bench("mxu bilinear", up_mxu, xh3, ref=refu3)
