"""Pallas TPU kernel: image warp (bilinear / nearest) as MXU matmul work.

THE core TPU-native trick of this renderer's temporal stack. XLA lowers a
per-pixel dependent fetch (`img[iy, ix]`) to its serial gather path at
~6 ns/row — every full-res 1080p warp costs >=12 ms, a bilinear 4-tap ~50 ms
(measured on-device; see docs/architecture.md). That forbids the reference's
"sample history where the pixel was last frame" pattern
(`taa/reproject_history.hlsl`, `rtdgi/restir_temporal.hlsl`, ...) on TPU.

This kernel reformulates a LOCAL warp as dense linear algebra. Per output
tile, a window of the source image is DMA'd to VMEM at a dynamic,
tile-aligned origin (scalar-prefetched per-tile minimum of the sample
positions), and the bilinear fetch becomes a separable TWO-HOT contraction
(one-hot for nearest):

  V   = win @ MxT     -- (WH, WW) x (WW, B) MXU matmul per channel
  out = sum_rows (MyT * V)   -- (WH, B) VPU multiply + sublane reduce

with MxT[c, p] = {1-fx at lx0(p), fx at lx0(p)+1}, MyT likewise. Taps that
clamp to the same texel accumulate, reproducing the XLA sampler's
clamp-per-tap addressing exactly. The gather thus becomes systolic-array
work (~WH*WW MAC per pixel-channel): a full 1080p 4-channel bilinear warp
lands in a few ms of MXU time instead of ~50 ms of serial gathers — and the
cost is independent of tap count (bilinear == nearest).

Correct wherever the warp is LOCAL: all sample positions of an output tile
must fit in the (WH, WW) window around their minimum. That covers
reprojection / temporal-history fetches (motion fields are smooth), ReSTIR
spatial taps (bounded radius), and motion-blur gathers. Pixels falling
outside the window clamp to its edge (such pixels carry ~zero reprojection
validity anyway). Arbitrary non-local fetches (texture pages) stay on the
XLA gather path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW = 16, 128         # output tile (B = TH*TW pixels per grid step)
# source window per tile; origins are tile-aligned (8 sublanes / 128 lanes)
# for the DMA, so the window is oversized to keep coverage after align-down:
# rows:  up to 7 align + 16 tile + 25 usable margin = 48
# cols:  up to 127 align + 128 tile + 64 usable margin = 320 -> 384 (128x)
# CONTRACT: within any (16, 128) output tile, sample positions may deviate
# from the tile minimum by at most ~24 rows / ~128 cols (Y_SLACK/X_SLACK);
# beyond that they clamp to the window edge. Reprojection fields and
# bounded-radius spatial taps satisfy this; arbitrary fetches do not.
WH, WW = 48, 384
Y_SLACK = WH - TH - 8
X_SLACK = WW - TW - 128


def _kernel(by_ref, bx_ref, u_ref, v_ref, img_ref, *rest,
            h: int, w: int, c: int, bilinear: bool, exact: bool,
            wh: int = WH):
    out_refs = rest[:c]
    win = rest[c]
    sem = rest[c + 1]
    i = pl.program_id(0)
    j = pl.program_id(1)
    ntx = pl.num_programs(1)
    nt = pl.num_programs(0) * ntx
    t = i * ntx + j

    # Double-buffered window DMA: the (C, WH, WW) strided window costs ~10us
    # of DMA latency (C*WH short row transfers); started one tile ahead it
    # hides behind the previous tile's compute.
    def start_dma(tile, slot):
        # origins are aligned by the wrapper; the annotation lets Mosaic
        # prove the slice honors the (8, 128) VMEM tiling
        by = pl.multiple_of(by_ref[tile], 8)
        bx = pl.multiple_of(bx_ref[tile], 128)
        pltpu.make_async_copy(
            img_ref.at[:, pl.ds(by, wh), pl.ds(bx, WW)],
            win.at[slot], sem.at[slot]).start()

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        start_dma(0, 0)

    @pl.when(t + 1 < nt)
    def _():
        start_dma(t + 1, jax.lax.rem(t + 1, 2))

    by = pl.multiple_of(by_ref[t], 8)
    bx = pl.multiple_of(bx_ref[t], 128)

    u = u_ref[:, :]                        # (TH, TW)
    v = v_ref[:, :]
    byf = by.astype(jnp.float32)
    bxf = bx.astype(jnp.float32)

    # Continuous local sample coordinates, clamped to the image then the
    # window. The per-tap weight matrix is then just the HAT FUNCTION
    # max(0, 1 - |col - xc|): at interior points this is exactly the
    # two-tap bilinear pair; at a clamped edge both taps collapse onto one
    # texel with weight 1 — identical to the XLA sampler's per-tap-clamp
    # addressing. Nearest mode passes integer-valued coordinates, for which
    # the hat degenerates to an exact one-hot.
    if bilinear:
        x = u * w - 0.5
        y = v * h - 0.5
    else:
        x = jnp.floor(u * w)
        y = jnp.floor(v * h)
    xc = jnp.clip(jnp.clip(x, 0.0, w - 1.0) - bxf, 0.0, WW - 1.0)
    yc = jnp.clip(jnp.clip(y, 0.0, h - 1.0) - byf, 0.0, wh - 1.0)

    # (1, B) row vectors in tile-row-major pixel order (roll each row to
    # sublane 0 first: lane-concat requires matching sublane offsets)
    def row0(a, r):
        return (a if r == 0 else pltpu.roll(a, TH - r, axis=0))[0:1, :]

    xrow = jnp.concatenate([row0(xc, r) for r in range(TH)], axis=1)
    yrow = jnp.concatenate([row0(yc, r) for r in range(TH)], axis=1)
    b = TH * TW
    colw = jax.lax.broadcasted_iota(jnp.int32, (WW, b), 0).astype(jnp.float32)
    colh = jax.lax.broadcasted_iota(jnp.int32, (wh, b), 0).astype(jnp.float32)
    mxt = jnp.maximum(0.0, 1.0 - jnp.abs(colw - xrow))   # (WW, B)
    myt = jnp.maximum(0.0, 1.0 - jnp.abs(colh - yrow))   # (WH, B)

    pltpu.make_async_copy(
        img_ref.at[:, pl.ds(by, wh), pl.ds(bx, WW)],
        win.at[slot], sem.at[slot]).wait()
    # all channels ride ONE matmul: M = C*WH rows fill the MXU's 128-row
    # passes (a lone WH=48-row matmul wastes 62% of the array)
    win_all = win[slot].reshape(c * wh, WW)
    # exact: 6-pass f32 emulation (bit-matches the XLA sampler, ~6x MXU
    # cost); fast: single bf16 pass (~0.2% rounding on values/weights —
    # invisible for radiance history, masks and 0/1 flags stay exact)
    prec = (jax.lax.Precision.HIGHEST if exact
            else jax.lax.Precision.DEFAULT)
    vmat = jax.lax.dot(win_all, mxt, precision=prec,
                       preferred_element_type=jnp.float32)      # (C*WH, B)
    for ch in range(c):
        res = jnp.sum(myt * vmat[ch * wh:(ch + 1) * wh, :], axis=0,
                      keepdims=True)                            # (1, B)
        # reassemble (1, B) -> (TH, TW) in registers (lane-roll each row
        # slice to offset 0, sublane-concat) and store the tile ONCE —
        # per-row stores were the kernel's dominant cost
        rows_out = jnp.concatenate(
            [(res if r == 0 else pltpu.roll(res, b - r * TW, axis=1))[:, :TW]
             for r in range(TH)], axis=0)                       # (TH, TW)
        out_refs[ch][:, :] = rows_out


def warp2d_pallas(img, uv, bilinear: bool = True, exact: bool = False,
                  interpret: bool = False, window_rows: int = WH):
    """img: (H, W, C) or (H, W); uv: (H2, W2, 2) in [0,1] texture coords.
    Returns (H2, W2, C) samples of img at uv (clamp addressing), matching
    `core.img.sample_bilinear` / `sample_nearest` up to window locality."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    oh, ow = uv.shape[:2]

    # pad the output lattice to tile multiples
    ph = (-oh) % TH
    pw = (-ow) % TW
    uvp = jnp.pad(uv, ((0, ph), (0, pw), (0, 0)), mode="edge")
    nty, ntx = (oh + ph) // TH, (ow + pw) // TW

    u = uvp[..., 0]
    v = uvp[..., 1]
    # per-tile window origin from the minimum (image-clamped) tap position
    if bilinear:
        x0 = jnp.clip(jnp.floor(u * w - 0.5), 0.0, w - 1.0)
        y0 = jnp.clip(jnp.floor(v * h - 0.5), 0.0, h - 1.0)
    else:
        x0 = jnp.clip(jnp.floor(u * w), 0.0, w - 1.0)
        y0 = jnp.clip(jnp.floor(v * h), 0.0, h - 1.0)
    ty = y0.reshape(nty, TH, ntx, TW).min(axis=(1, 3))
    tx = x0.reshape(nty, TH, ntx, TW).min(axis=(1, 3))
    # align origins down to the VMEM tiling (8 sublanes, 128 lanes)
    wh = window_rows
    by = ((jnp.clip(ty.astype(jnp.int32), 0, h - wh) // 8) * 8).reshape(-1)
    bx = ((jnp.clip(tx.astype(jnp.int32), 0, w - WW) // 128) * 128).reshape(-1)

    img_chw = jnp.transpose(img, (2, 0, 1))           # (C, H, W)

    kernel = functools.partial(_kernel, h=h, w=w, c=c, bilinear=bilinear,
                               exact=exact, wh=wh)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec((TH, TW), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, TW), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),     # img stays in HBM
        ],
        out_specs=[pl.BlockSpec((TH, TW), lambda i, j, *_: (i, j),
                                memory_space=pltpu.VMEM)] * c,
        scratch_shapes=[
            pltpu.VMEM((2, c, wh, WW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nty * TH, ntx * TW), jnp.float32)] * c,
        interpret=interpret,
    )(by, bx, u, v, img_chw)

    out = jnp.stack([o[:oh, :ow] for o in outs], axis=-1)
    return out[..., 0] if squeeze else out


def warp_supported(img, uv, window_rows: int = WH) -> bool:
    """Pallas path needs the window to fit and a real TPU backend."""
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    return (h >= window_rows and w >= WW and c <= 16
            and jax.devices()[0].platform == "tpu")
