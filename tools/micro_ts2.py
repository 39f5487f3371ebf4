"""Bisect mosaic failures: (1) arbitrary-sublane-origin DMA, (2) dynamic roll."""
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from devbench import dev_ms

H, W, C = 544, 896, 15
TH, TW = 8, 128


def test(name, kernel, scratch_ww):
    def call(img, dy, dx):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H // TH, W // TW),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((C, TH, TW), lambda i, j, *_: (0, i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((C, TH, scratch_ww), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )
        return pl.pallas_call(kernel, grid_spec=grid_spec,
                              out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.float32),
                              )(dy, dx, img)
    img = jax.random.normal(jax.random.PRNGKey(0), (C, H, W), jnp.float32)
    nt = (H // TH) * (W // TW)
    dy = jax.random.randint(jax.random.PRNGKey(1), (nt,), -12, 13, jnp.int32)
    dx = jax.random.randint(jax.random.PRNGKey(2), (nt,), -12, 13, jnp.int32)
    try:
        out = jax.block_until_ready(jax.jit(call)(img, dy, dx))
        print(name, "OK")
        dev_ms(call, img, dy, dx, label=name)
        return call
    except Exception as e:
        print(name, "FAILED:", type(e).__name__, str(e)[:2000])
        return None


# (1) row-shift only: DMA from arbitrary sublane origin, aligned lanes
def k_rows(dy_ref, dx_ref, img_ref, out_ref, win, sem):
    i, j = pl.program_id(0), pl.program_id(1)
    t = i * pl.num_programs(1) + j
    sy = jnp.clip(i * TH + dy_ref[t], 0, H - TH)
    cp = pltpu.make_async_copy(
        img_ref.at[:, pl.ds(sy, TH), pl.ds(j * TW, TW)], win, sem)
    cp.start(); cp.wait()
    out_ref[...] = win[...]


test("rows_dma", k_rows, TW)


# (2) aligned DMA + dynamic lane roll
def k_roll(dy_ref, dx_ref, img_ref, out_ref, win, sem):
    i, j = pl.program_id(0), pl.program_id(1)
    t = i * pl.num_programs(1) + j
    WW = TW + 256
    bx = jnp.clip(j * TW - 128, 0, W - WW)
    cp = pltpu.make_async_copy(
        img_ref.at[:, pl.ds(i * TH, TH), pl.ds(bx, WW)], win, sem)
    cp.start(); cp.wait()
    sx = jnp.clip(j * TW + dx_ref[t], 0, W - TW) - bx
    w = pltpu.roll(win[...].reshape(C * TH, WW), -sx, axis=1)
    out_ref[...] = w[:, :TW].reshape(C, TH, TW)


test("lane_roll", k_roll, TW + 256)


# (3) combined
def k_both(dy_ref, dx_ref, img_ref, out_ref, win, sem):
    i, j = pl.program_id(0), pl.program_id(1)
    t = i * pl.num_programs(1) + j
    WW = TW + 256
    sy = jnp.clip(i * TH + dy_ref[t], 0, H - TH)
    bx = jnp.clip(j * TW - 128, 0, W - WW)
    cp = pltpu.make_async_copy(
        img_ref.at[:, pl.ds(sy, TH), pl.ds(bx, WW)], win, sem)
    cp.start(); cp.wait()
    sx = jnp.clip(j * TW + dx_ref[t], 0, W - TW) - bx
    w = pltpu.roll(win[...].reshape(C * TH, WW), -sx, axis=1)
    out_ref[...] = w[:, :TW].reshape(C, TH, TW)


call = test("both", k_both, TW + 256)

if call is not None:
    # correctness vs XLA
    img = jax.random.normal(jax.random.PRNGKey(0), (C, H, W), jnp.float32)
    nt = (H // TH) * (W // TW)
    dy = jax.random.randint(jax.random.PRNGKey(1), (nt,), -12, 13, jnp.int32)
    dx = jax.random.randint(jax.random.PRNGKey(2), (nt,), -12, 13, jnp.int32)
    nty, ntx = H // TH, W // TW
    dyf = jnp.repeat(jnp.repeat(dy.reshape(nty, ntx), TH, 0), TW, 1)
    dxf = jnp.repeat(jnp.repeat(dx.reshape(nty, ntx), TH, 0), TW, 1)
    base_y = (jnp.arange(H)[:, None] // TH) * TH
    base_x = (jnp.arange(W)[None, :] // TW) * TW
    iy = jnp.clip(base_y + dyf, 0, H - TH) + jnp.arange(H)[:, None] % TH
    ix = jnp.clip(base_x + dxf, 0, W - TW) + jnp.arange(W)[None, :] % TW
    ref = img[:, iy, ix]
    out = jax.jit(call)(img, dy, dx)
    import numpy as np
    print("equal:", bool(jnp.array_equal(out, ref)),
          "maxdiff:", float(jnp.abs(out - ref).max()))
