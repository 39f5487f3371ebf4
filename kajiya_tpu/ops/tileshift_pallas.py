"""Pallas TPU kernel: whole-image fetch at PER-TILE constant pixel offsets.

The reference's ReSTIR spatial-reuse passes deliberately QUANTIZE their
random kernel rotations to 8x8 pixel blocks for cache coherence
(`assets/shaders/rtdgi/restir_spatial.hlsl:108-119` — "Scrambling angles
here would be nice, but results in bad cache thrashing"). This kernel is
the TPU-native endpoint of that idea: quantize the spatial-reuse offset to
the hardware tile (8 sublanes x 128 lanes) and the per-pixel gather
becomes ONE aligned window DMA + two in-register dynamic rolls per tile —
pure data movement, no MXU work, no serial gather.

The image is edge-padded by the max offset before the kernel, so taps near
borders CLAMP PER PIXEL (replicated edge texels) instead of losing their
offset: zeroing the shift at edge tiles decorrelates to zero and lets
columns evolve as independent reservoir chains (visible striping).

Measured (v5e, 15-channel 544x896 plane): ~0.2 ms vs 2.7 ms for the XLA
gather of the same quantized fetch and ~2 ms for the two-hot warp matmul
kernel (ops/warp_pallas.py) — and unlike the warp kernel the cost is pure
bandwidth, independent of tap radius.

The XLA fallback reproduces the kernel's semantics bit-for-bit, so CPU
tests validate the TPU path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW = 8, 128          # the offset-quantization tile = the VMEM tile
MAX_DY = 16              # |dy| <= 16 rows
MAX_DX = 64              # |dx| <= 64 cols
_WH = TH + 8             # window: tile + one sublane-tile of roll slack
_WW = TW + 128           # window: tile + one lane-tile of roll slack


def _kernel(dy_ref, dx_ref, img_ref, *rest, c: int):
    out_refs = rest[:c]
    win, sem = rest[c], rest[c + 1]
    i, j = pl.program_id(0), pl.program_id(1)
    t = i * pl.num_programs(1) + j

    # source origin in the padded image; never clamped (padding covers the
    # full offset range), so the shift always survives intact
    sy = i * TH + MAX_DY + dy_ref[t]
    sx = j * TW + MAX_DX + dx_ref[t]
    by = pl.multiple_of((sy // 8) * 8, 8)
    bx = pl.multiple_of((sx // 128) * 128, 128)
    cp = pltpu.make_async_copy(
        img_ref.at[:, pl.ds(by, _WH), pl.ds(bx, _WW)], win, sem)
    cp.start()
    cp.wait()
    ry = sy - by                 # 0..7
    rx = sx - bx                 # 0..127
    for ch in range(c):
        v = pltpu.roll(win[ch], _WW - rx, axis=1)
        v = pltpu.roll(v, _WH - ry, axis=0)
        out_refs[ch][...] = v[:TH, :TW]


def _tile_shift_pallas(imgp_chw, dy, dx, nty, ntx):
    c = imgp_chw.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((TH, TW), lambda i, j, *_: (i, j),
                                memory_space=pltpu.VMEM)] * c,
        scratch_shapes=[pltpu.VMEM((c, _WH, _WW), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    kernel = functools.partial(_kernel, c=c)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nty * TH, ntx * TW), jnp.float32)] * c,
    )(dy, dx, imgp_chw)


def _tile_shift_xla(imgp, dy, dx, nty, ntx):
    """Bit-identical fetch as an XLA gather, on the padded image."""
    oh, ow = nty * TH, ntx * TW
    dyf = jnp.repeat(jnp.repeat(dy.reshape(nty, ntx), TH, 0), TW, 1)
    dxf = jnp.repeat(jnp.repeat(dx.reshape(nty, ntx), TH, 0), TW, 1)
    iy = jnp.arange(oh)[:, None] + MAX_DY + dyf
    ix = jnp.arange(ow)[None, :] + MAX_DX + dxf
    return imgp[iy, ix]


def tile_grid(h: int, w: int):
    """Number of offset tiles (nty, ntx) for an (h, w) image."""
    return -(-h // TH), -(-w // TW)


def tile_shift(img, dy, dx):
    """img: (H, W, C) or (H, W) f32. dy/dx: (nty*ntx,) int32 per-tile pixel
    offsets (row-major tiles of (8, 128); see tile_grid). Returns the image
    where each tile's texels are fetched from `texel + (dy, dx)` with
    per-pixel edge clamping (offsets beyond the border read replicated edge
    texels, like the reference's clamped taps). TPU runs the Pallas kernel;
    other backends run a bit-identical XLA gather."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    nty, ntx = tile_grid(h, w)
    dy = jnp.clip(jnp.asarray(dy, jnp.int32), -MAX_DY, MAX_DY)
    dx = jnp.clip(jnp.asarray(dx, jnp.int32), -MAX_DX, MAX_DX)
    # edge-pad by the offset range, plus alignment slack for ragged sizes
    pb = nty * TH - h + MAX_DY + 8       # bottom: ragged + roll slack
    pr = ntx * TW - w + MAX_DX + 128     # right: ragged + roll slack
    imgp = jnp.pad(img, ((MAX_DY, pb), (MAX_DX, pr), (0, 0)), mode="edge")
    if jax.devices()[0].platform == "tpu":
        outs = _tile_shift_pallas(jnp.transpose(imgp, (2, 0, 1)), dy, dx,
                                  nty, ntx)
        out = jnp.stack([o[:h, :w] for o in outs], axis=-1)
    else:
        out = _tile_shift_xla(imgp, dy, dx, nty, ntx)[:h, :w]
    return out[..., 0] if squeeze else out
