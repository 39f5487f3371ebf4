"""Prototype: per-(8,128)-tile constant-offset fetch as pure DMA.

Candidate mechanisms:
  a) direct DMA from an arbitrary (possibly lane-misaligned) origin
  b) aligned window DMA + dynamic lane roll in VMEM
Reference result via XLA gather with the same quantized offsets.
"""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from devbench import dev_ms

TH, TW = 8, 128
H, W, C = 544, 896, 15
R = 12  # max offset radius


WW = TW + 256


def _kernel_direct(dy_ref, dx_ref, img_ref, out_ref, win, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ntx = pl.num_programs(1)
    t = i * ntx + j
    sy = jnp.clip(i * TH + dy_ref[t], 0, H - TH)
    # window starts one lane-tile before the output tile; dx in [-128, 128)
    bx = jnp.clip(j * TW - 128, 0, W - WW)
    cp = pltpu.make_async_copy(
        img_ref.at[:, pl.ds(sy, TH), pl.ds(bx, WW)], win, sem)
    cp.start()
    cp.wait()
    # desired source column = clip(j*TW + dx, 0, W - TW); local = that - bx
    sx = jnp.clip(j * TW + dx_ref[t], 0, W - TW) - bx
    w = pltpu.roll(win[...].reshape(C * TH, WW), -sx, axis=1)
    out = w[:, :TW].reshape(C, TH, TW)
    for c in range(C):
        out_ref[c] = out[c]


def tile_shift_direct(img_chw, dy, dx):
    c, h, w = img_chw.shape
    nty, ntx = h // TH, w // TW
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((c, TH, TW), lambda i, j, *_: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((c, TH, WW), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _kernel_direct, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
    )(dy, dx, img_chw)


def ref_xla(img_chw, dy, dx):
    c, h, w = img_chw.shape
    nty, ntx = h // TH, w // TW
    dyf = jnp.repeat(jnp.repeat(dy.reshape(nty, ntx), TH, 0), TW, 1)
    dxf = jnp.repeat(jnp.repeat(dx.reshape(nty, ntx), TH, 0), TW, 1)
    base_y = (jnp.arange(h)[:, None] // TH) * TH
    base_x = (jnp.arange(w)[None, :] // TW) * TW
    iy = jnp.clip(base_y + dyf, 0, h - TH) + jnp.arange(h)[:, None] % TH
    ix = jnp.clip(base_x + dxf, 0, w - TW) + jnp.arange(w)[None, :] % TW
    return img_chw[:, iy, ix]


k = jax.random.PRNGKey(0)
img = jax.random.normal(k, (C, H, W), jnp.float32)
nty, ntx = H // TH, W // TW
kk = jax.random.split(k, 2)
dy = jax.random.randint(kk[0], (nty * ntx,), -R, R + 1, jnp.int32)
dx = jax.random.randint(kk[1], (nty * ntx,), -R, R + 1, jnp.int32)

try:
    a = jax.jit(tile_shift_direct)(img, dy, dx)
    b = jax.jit(ref_xla)(img, dy, dx)
    eq = bool(jnp.array_equal(a, b))
    print("direct DMA equal:", eq)
    if eq:
        dev_ms(tile_shift_direct, img, dy, dx, label="tile_shift_direct")
except Exception as e:
    print("direct DMA failed:", type(e).__name__, str(e)[:300])

dev_ms(ref_xla, img, dy, dx, label="ref_xla_gather")
