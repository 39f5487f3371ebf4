"""Compare restir resolve: current half_to_full_taps form vs phase-major."""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from kajiya_tpu.core import img as im

H, W = 1080, 1920
HH, HW = H // 2, W // 2
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
rad_h = jax.random.uniform(ks[0], (HH, HW, 3))
dir_h = jax.random.normal(ks[1], (HH, HW, 3))
w_h = jax.random.uniform(ks[2], (HH, HW))
depth = jax.random.uniform(ks[3], (H, W)) + 0.1
n_full = jax.random.normal(ks[4], (H, W, 3))
near = 0.01


def resolve_current(rad_res, dir_res, w_res, depth, n_full):
    vz = near / jnp.maximum(depth, 1e-12)
    vz_h = near / jnp.maximum(im.decimate2(depth), 1e-12)
    n_h = im.decimate2(n_full)
    rad_t, weights = im.half_to_full_taps(rad_res)
    dir_t, _ = im.half_to_full_taps(dir_res)
    w_t, _ = im.half_to_full_taps(w_res)
    z_t, _ = im.half_to_full_taps(vz_h)
    n_t, _ = im.half_to_full_taps(n_h)
    acc = jnp.zeros_like(rad_t[0])
    accw = jnp.zeros_like(w_t[0])
    for rad, dirs, ww, zz, nn, bw in zip(rad_t, dir_t, w_t, z_t, n_t, weights):
        w_z = jnp.exp(-jnp.abs(zz - vz) / (0.05 * vz + 1e-4))
        w_n = jnp.maximum(jnp.sum(nn * n_full, axis=-1), 0.0) ** 8
        wt = bw * w_z * w_n + 1e-6
        cosf = jnp.maximum(jnp.sum(dirs * n_full, axis=-1), 0.0)
        acc = acc + rad * (cosf * ww * wt)[..., None]
        accw = accw + wt
    return acc / accw[..., None] / jnp.pi


def shift_h(x, dy, dx):
    """Static small shift of a half-res plane with edge clamp, pad+slice."""
    pw = [(max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0))]
    if x.ndim == 3:
        pw = pw + [(0, 0)]
    y = jnp.pad(x, pw, mode="edge")
    return y[max(dy, 0):max(dy, 0) + x.shape[0],
             max(dx, 0):max(dx, 0) + x.shape[1]]


def phase_split(x):
    """(H, W[, C]) -> 4 phase planes [(py, px)] at half res (one relayout)."""
    h, w = x.shape[0], x.shape[1]
    r = x.reshape((h // 2, 2, w // 2, 2) + x.shape[2:])
    return [[r[:, py, :, px] for px in (0, 1)] for py in (0, 1)]


def weave(ph):
    """4 half-res phase planes [(py, px)] -> (H, W[, C]) one-shot."""
    hh, hw = ph[0][0].shape[0], ph[0][0].shape[1]
    rows = [jnp.stack(r, axis=2) for r in ph]    # (hh, hw, 2, ...)
    x = jnp.stack(rows, axis=1)                  # (hh, 2, hw, 2, ...)
    return x.reshape((2 * hh, 2 * hw) + ph[0][0].shape[2:])


def resolve_phase(rad_res, dir_res, w_res, depth, n_full):
    vz_ph = phase_split(near / jnp.maximum(depth, 1e-12))
    n_ph = phase_split(n_full)
    vz_h = vz_ph[0][0]
    n_h = n_ph[0][0]
    out_ph = [[None, None], [None, None]]
    for py in (0, 1):
        for px in (0, 1):
            vz = vz_ph[py][px]
            nf = n_ph[py][px]
            acc = jnp.zeros((HH, HW, 3))
            accw = jnp.zeros((HH, HW))
            for ky in (0, 1):
                for kx in (0, 1):
                    dy, dx = ky - 1 + py, kx - 1 + px
                    bw = (0.75 if ky != py else 0.25) * \
                         (0.75 if kx != px else 0.25)
                    rad = shift_h(rad_res, dy, dx)
                    dirs = shift_h(dir_res, dy, dx)
                    ww = shift_h(w_res, dy, dx)
                    zz = shift_h(vz_h, dy, dx)
                    nn = shift_h(n_h, dy, dx)
                    w_z = jnp.exp(-jnp.abs(zz - vz) / (0.05 * vz + 1e-4))
                    w_n = jnp.maximum(jnp.sum(nn * nf, axis=-1), 0.0) ** 8
                    wt = bw * w_z * w_n + 1e-6
                    cosf = jnp.maximum(jnp.sum(dirs * nf, axis=-1), 0.0)
                    acc = acc + rad * (cosf * ww * wt)[..., None]
                    accw = accw + wt
            out_ph[py][px] = acc / accw[..., None] / jnp.pi
    return weave(out_ph)


def bench(name, fn, *args):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn_j(*args)
    jax.block_until_ready(out)
    print(f"{name:24s} {(time.perf_counter() - t0) / n * 1000:8.3f} ms")
    return out


a = bench("resolve_current", resolve_current, rad_h, dir_h, w_h, depth, n_full)
b = bench("resolve_phase", resolve_phase, rad_h, dir_h, w_h, depth, n_full)
print("max abs diff:", float(jnp.abs(a - b).max()))

# paranoid timing: force a host fetch each iteration
import numpy as np
for name, fn in (("cur_hostsync", resolve_current), ("ph_hostsync", resolve_phase)):
    fn_j = jax.jit(lambda *a, f=fn: f(*a).sum())
    _ = float(fn_j(rad_h, dir_h, w_h, depth, n_full))
    t0 = time.perf_counter()
    for _ in range(10):
        s = float(fn_j(rad_h, dir_h, w_h, depth, n_full))
    print(f"{name:24s} {(time.perf_counter() - t0) / 10 * 1000:8.3f} ms  sum={s:.3f}")

from devbench import dev_ms
dev_ms(resolve_current, rad_h, dir_h, w_h, depth, n_full, label="resolve_current(dev)")
dev_ms(resolve_phase, rad_h, dir_h, w_h, depth, n_full, label="resolve_phase(dev)")
