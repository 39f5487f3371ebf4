"""Motion blur: velocity tile reduce -> dilate -> gather blur.

Role of `renderers/motion_blur.rs:5-72` + the Rust-GPU kernels
(`rust-shaders/src/motion_blur.rs`): per-16px-tile max velocity, 3x3 tile
dilation, then a gather blur along the dominant velocity (McGuire-style).
All static-shape stencil/gather work on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import img as im

TILE = 16
N_TAPS = 8


def _tile_reduce_max(vel, tile: int):
    """(H, W, 2) -> (H/t, W/t, 2): velocity of max magnitude per tile
    (velocity_reduce_x/_y passes)."""
    h, w = vel.shape[:2]
    ht, wt = h // tile, w // tile
    v = vel[:ht * tile, :wt * tile].reshape(ht, tile, wt, tile, 2)
    # winner-mask reduction instead of transpose+argmax+gather: reductions
    # over the strided (1, 3) axes stay in-layout on the VPU, while the
    # transpose pair relayouts two full planes (the round-4 finding:
    # stride shuffles cost ~1-4 ms per 1080p plane). Ties average.
    mag = (v * v).sum(-1)                          # (ht, tile, wt, tile)
    mmax = mag.max(axis=(1, 3), keepdims=True)
    win = (mag >= mmax)[..., None]
    cnt = win.sum(axis=(1, 3))
    return (v * win).sum(axis=(1, 3)) / jnp.maximum(cnt, 1.0)


def _dilate_max(tiles):
    """3x3 max-magnitude dilation (velocity_dilate pass)."""
    s = im.shift_stack(tiles, im.OFF3X3)             # (9, ht, wt, 2)
    mag = jnp.linalg.norm(s, axis=-1)
    k = jnp.argmax(mag, axis=0)
    sel = (jnp.arange(s.shape[0])[:, None, None] == k)[..., None]
    return jnp.sum(jnp.where(sel, s, 0.0), axis=0)


def motion_blur(color, velocity, depth, frame_fraction: float = 0.5):
    """color (H, W, 3), velocity (H, W, 2) in uv units (cur->prev), depth
    reversed-Z. Returns blurred color. frame_fraction scales the blur
    (shutter; the reference's motion_blur_scale)."""
    from ..core.profiling import pass_scope

    h, w = color.shape[:2]
    with pass_scope("tiles"):
        tiles = _tile_reduce_max(velocity, TILE)
        tiles = _dilate_max(tiles)
        tile_vel = im.upsample_bilinear(tiles, h, w) * frame_fraction

    # Gather taps run at QUARTER RES (blur is the lowest-frequency pass in
    # the frame: direction is constant per 16px tile by construction, and
    # the full-res composite below restores sharpness wherever the blur
    # amount is small — full-res XLA gathers cost ~9 ms per tap, half-res
    # ~0.8 ms, quarter ~0.2 ms with no visible difference through the
    # amount composite). Velocities clamp to the warp locality contract.
    hh, hw = h // 4, w // 4
    color_h = im.downsample_2x(im.downsample_2x(color))
    depth_h = im.downsample_nearest(im.downsample_nearest(depth))
    max_uv = jnp.asarray([48.0 / hw, 20.0 / hh])
    vel_h = jnp.clip(im.decimate2(im.decimate2(tile_vel)), -max_uv, max_uv)
    uv_h = im.pixel_uv(hh, hw)
    packed = jnp.concatenate([color_h, depth_h[..., None]], axis=-1)
    acc = jnp.zeros_like(color_h)
    wsum = jnp.zeros((hh, hw, 1), jnp.float32)
    for i in range(N_TAPS):
      with pass_scope(f"tap{i}"):
        t = (i + 0.5) / N_TAPS - 0.5
        suv = uv_h + vel_h * t
        f = im.warp_nearest(packed, suv)
        c, d = f[..., :3], f[..., 3]
        # depth-aware: don't smear foreground over background
        wgt = jnp.where(d[..., None] >= depth_h[..., None] * 0.95, 1.0,
                        0.25)
        acc = acc + c * wgt
        wsum = wsum + wgt
    blur_h = acc / jnp.maximum(wsum, 1e-6)
    blur = im.upsample_bilinear(blur_h, h, w)
    amount = jnp.clip(jnp.linalg.norm(tile_vel * jnp.asarray(
        [float(w), float(h)]), axis=-1) / 2.0, 0.0, 1.0)[..., None]
    return color * (1.0 - amount) + blur * amount
