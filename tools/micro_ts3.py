"""Tile-shift kernel structured exactly like the working warp kernel:
per-channel 2-D out blocks, multiple_of alignment hints where aligned."""
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from devbench import dev_ms

H, W, C = 544, 896, 15
TH, TW = 8, 128


def mk(variant):
    WW = TW + 256

    def kernel(dy_ref, dx_ref, img_ref, *rest):
        out_refs = rest[:C]
        win, sem = rest[C], rest[C + 1]
        i, j = pl.program_id(0), pl.program_id(1)
        t = i * pl.num_programs(1) + j
        if variant in ("rows", "both"):
            sy = jnp.clip(i * TH + dy_ref[t], 0, H - TH)
        else:
            sy = pl.multiple_of(i * TH, 8)
        if variant in ("lanes", "both"):
            bx = pl.multiple_of(jnp.clip(j * TW - 128, 0, W - WW) // 128 * 128, 128)
            ww = WW
        else:
            bx = pl.multiple_of(j * TW, 128)
            ww = TW
        cp = pltpu.make_async_copy(
            img_ref.at[:, pl.ds(sy, TH), pl.ds(bx, ww)], win.at[:, :, :ww], sem)
        cp.start(); cp.wait()
        if variant in ("lanes", "both"):
            sx = jnp.clip(j * TW + dx_ref[t], 0, W - TW) - bx
            for c in range(C):
                out_refs[c][...] = pltpu.roll(win[c, :, :ww], -sx, axis=1)[:, :TW]
        else:
            for c in range(C):
                out_refs[c][...] = win[c, :, :TW]

    def call(img, dy, dx):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H // TH, W // TW),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[pl.BlockSpec((TH, TW), lambda i, j, *_: (i, j),
                                    memory_space=pltpu.VMEM)] * C,
            scratch_shapes=[pltpu.VMEM((C, TH, WW), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )
        outs = pl.pallas_call(kernel, grid_spec=grid_spec,
                              out_shape=[jax.ShapeDtypeStruct((H, W), jnp.float32)] * C,
                              )(dy, dx, img)
        return jnp.stack(outs, 0)
    return call


img = jax.random.normal(jax.random.PRNGKey(0), (C, H, W), jnp.float32)
nt = (H // TH) * (W // TW)
dy = jax.random.randint(jax.random.PRNGKey(1), (nt,), -12, 13, jnp.int32)
dx = jax.random.randint(jax.random.PRNGKey(2), (nt,), -12, 13, jnp.int32)

for variant in ("none", "rows", "lanes", "both"):
    call = mk(variant)
    try:
        out = jax.jit(call)(img, dy, dx)
        float(out.sum())
        print(variant, "OK")
        dev_ms(call, img, dy, dx, label=f"tileshift[{variant}]")
    except Exception as e:
        print(variant, "FAILED:", type(e).__name__, str(e)[:150].replace("\n", " "))


# row AND lane shifts both via in-VMEM dynamic rolls from an aligned window
def mk_roll2d():
    WW = TW + 256
    WH = TH + 32

    def kernel(dy_ref, dx_ref, img_ref, *rest):
        out_refs = rest[:C]
        win, sem = rest[C], rest[C + 1]
        i, j = pl.program_id(0), pl.program_id(1)
        t = i * pl.num_programs(1) + j
        by = pl.multiple_of(jnp.clip(i * TH - 16, 0, H - WH), 8)
        bx = pl.multiple_of(jnp.clip(j * TW - 128, 0, W - WW) // 128 * 128, 128)
        cp = pltpu.make_async_copy(
            img_ref.at[:, pl.ds(by, WH), pl.ds(bx, WW)], win, sem)
        cp.start(); cp.wait()
        sy = jnp.clip(i * TH + dy_ref[t], 0, H - TH) - by
        sx = jnp.clip(j * TW + dx_ref[t], 0, W - TW) - bx
        for c in range(C):
            v = pltpu.roll(win[c], WW - sx, axis=1)
            v = pltpu.roll(v, WH - sy, axis=0)
            out_refs[c][...] = v[:TH, :TW]

    def call(img, dy, dx):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H // TH, W // TW),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[pl.BlockSpec((TH, TW), lambda i, j, *_: (i, j),
                                    memory_space=pltpu.VMEM)] * C,
            scratch_shapes=[pltpu.VMEM((C, WH, WW), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )
        outs = pl.pallas_call(kernel, grid_spec=grid_spec,
                              out_shape=[jax.ShapeDtypeStruct((H, W), jnp.float32)] * C,
                              )(dy, dx, img)
        return jnp.stack(outs, 0)
    return call


call = mk_roll2d()
try:
    out = jax.jit(call)(img, dy, dx)
    # correctness vs XLA quantized gather
    nty, ntx = H // TH, W // TW
    dyf = jnp.repeat(jnp.repeat(dy.reshape(nty, ntx), TH, 0), TW, 1)
    dxf = jnp.repeat(jnp.repeat(dx.reshape(nty, ntx), TH, 0), TW, 1)
    base_y = (jnp.arange(H)[:, None] // TH) * TH
    base_x = (jnp.arange(W)[None, :] // TW) * TW
    iy = jnp.clip(base_y + dyf, 0, H - TH) + jnp.arange(H)[:, None] % TH
    ix = jnp.clip(base_x + dxf, 0, W - TW) + jnp.arange(W)[None, :] % TW
    ref = img[:, iy, ix]
    print("roll2d OK, equal:", bool(jnp.array_equal(out, ref)))
    dev_ms(call, img, dy, dx, label="tileshift[roll2d]")
except Exception as e:
    print("roll2d FAILED:", type(e).__name__, str(e)[:150].replace("\n", " "))

d = jnp.abs(out - ref).max(axis=0)          # (H, W)
bad = (d > 1e-6)
import numpy as np
bt = np.asarray(bad.reshape(H // TH, TH, W // TW, TW).any(axis=(1, 3)))
print("bad tiles:", bt.sum(), "of", bt.size)
ys, xs = np.nonzero(bt)
for y, x in list(zip(ys, xs))[:8]:
    t = y * (W // TW) + x
    print("tile", y, x, "dy", int(dy[t]), "dx", int(dx[t]))
