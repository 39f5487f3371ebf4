"""Tile-binned software rasterizer for primary visibility ("raster simple").

Role of the reference's raster pass (`renderers/raster_meshes.rs:28-178`,
`raster_simple_vs.hlsl` / `raster_simple_ps.hlsl`) — the "RTX off" primary
path (BASELINE config 1).

TPU-first formulation: classic rasterization's speed comes from BINNING —
per screen tile, only triangles whose projected bounds overlap the tile are
tested. Here that binning is exact 2D work: every Morton-ordered triangle
block's world AABB is projected once per frame (8 corners x one matmul) to
a conservative screen rect, and each 2D pixel chunk keeps only the blocks
whose rect overlaps its own. The per-pixel visibility test then runs on the
same streaming Woop intersector as every other pass (ops/woop_pallas.py) —
mathematically identical hits to the traced g-buffer (the raster-vs-trace
parity test is exact, not eps), shared VMEM kernel, and the reference's
"raster writes the same gbuffer the RT passes read" contract holds by
construction. Blocks fully behind the eye plane are dropped (their
projected rect is empty), blocks crossing it go conservative full-screen.

This replaces the 3D cone-beam cull of the traced path with exact 2D rect
overlap for primary rays — strictly tighter lists, which is where the
raster-vs-trace speedup lives on big scenes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.camera import ViewConstants, camera_rays
from ..ops.tiling import TILE_H, TILE_W, pad_hw, tile_order, untile_order
from ..rt.trace import Hit, INF, _use_pallas


def _block_screen_rects(bmin, bmax, view: ViewConstants, w: int, h: int):
    """(C, 3) world AABBs -> conservative pixel rects (C, 4) [x0, y0, x1, y1]
    (inclusive float bounds). Empty/behind blocks give empty rects;
    near-plane-crossing blocks give full-screen rects."""
    c = bmin.shape[0]
    # 8 corners via bit masks (C, 8, 3)
    sel = jnp.asarray([[(i >> k) & 1 for k in range(3)] for i in range(8)],
                      jnp.float32)                        # (8, 3)
    corners = bmin[:, None, :] * (1.0 - sel) + bmax[:, None, :] * sel
    m = view.world_to_clip                                # (4, 4)
    clip = jnp.einsum("cki,ji->ckj", corners, m[:, :3]) + m[:, 3]
    cw = clip[..., 3]                                     # (C, 8)
    eps = 1e-6
    in_front = cw > eps
    any_front = in_front.any(axis=1)
    all_front = in_front.all(axis=1)
    # empty block: build_clusters collapses padded blocks to inverted boxes
    nonempty = jnp.all(bmin <= bmax, axis=-1) & jnp.all(
        jnp.isfinite(bmin) & jnp.isfinite(bmax), axis=-1)

    safe_w = jnp.where(in_front, cw, 1.0)
    ndc = clip[..., :2] / safe_w[..., None]
    px = (0.5 + 0.5 * ndc[..., 0]) * w
    py = (0.5 - 0.5 * ndc[..., 1]) * h
    big = jnp.float32(1e9)
    # A non-finite in-front projection means the corner's screen position is
    # unknown: treat it conservatively on BOTH passes (grow the rect to
    # full-screen scale) so the block is kept, never wrongly culled. Behind
    # corners are inert on both passes (+big for min, -big for max).
    finite = jnp.isfinite(px) & jnp.isfinite(py)
    x0 = jnp.where(in_front, jnp.where(finite, px, -big), big).min(axis=1)
    y0 = jnp.where(in_front, jnp.where(finite, py, -big), big).min(axis=1)
    x1 = jnp.where(in_front, jnp.where(finite, px, big), -big).max(axis=1)
    y1 = jnp.where(in_front, jnp.where(finite, py, big), -big).max(axis=1)
    # crossing the eye plane: conservative full screen
    crossing = any_front & ~all_front
    x0 = jnp.where(crossing, 0.0, x0)
    y0 = jnp.where(crossing, 0.0, y0)
    x1 = jnp.where(crossing, jnp.float32(w), x1)
    y1 = jnp.where(crossing, jnp.float32(h), y1)
    # fully behind or empty: empty rect
    dead = ~any_front | ~nonempty
    x0 = jnp.where(dead, big, x0)
    x1 = jnp.where(dead, -big, x1)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def _chunk_rects(w: int, h: int, rows_per_chunk: int):
    """Pixel rect of every ray chunk in tile-major order: tiles are
    TILE_H x TILE_W (ops/tiling.py), each split into row strips of
    rows_per_chunk (a Pallas CULL_RAY_BLOCK = rows_per_chunk * TILE_W rays).
    Returns (n_chunks, 4) [x0, y0, x1, y1] inclusive-exclusive bounds."""
    ph, pw = pad_hw(h, w)
    nty, ntx = (h + ph) // TILE_H, (w + pw) // TILE_W
    per_tile = TILE_H // rows_per_chunk
    i = jnp.arange(nty * ntx * per_tile)
    tile = i // per_tile
    sub = i % per_tile
    ty, tx = tile // ntx, tile % ntx
    y0 = (ty * TILE_H + sub * rows_per_chunk).astype(jnp.float32)
    x0 = (tx * TILE_W).astype(jnp.float32)
    return jnp.stack([x0, y0, x0 + TILE_W, y0 + rows_per_chunk], axis=-1)


def _overlap(chunk_rects, block_rects):
    """(n_chunks, C) bool rect overlap."""
    cx0, cy0, cx1, cy1 = [chunk_rects[:, k, None] for k in range(4)]
    bx0, by0, bx1, by1 = [block_rects[None, :, k] for k in range(4)]
    return (cx0 <= bx1) & (cx1 >= bx0) & (cy0 <= by1) & (cy1 >= by0)


def _mask_to_lists(hit, bmin, bmax, eye):
    """(n, C) bool -> front-to-back (blist, bdist, count): primary rays all
    start at the eye, so the conservative t lower bound per block is
    |center - eye| - radius (the kernel's early-z stop,
    woop_pallas.sort_blocks_by_distance)."""
    from ..ops.woop_pallas import sort_blocks_by_distance

    c = (bmin + bmax) * 0.5
    r = jnp.sqrt(jnp.maximum(((bmax - bmin) * 0.5) ** 2, 0.0).sum(-1))
    dlb = jnp.maximum(
        jnp.sqrt(jnp.maximum(((c - eye) ** 2).sum(-1), 0.0)) - r, 0.0)
    dlb = jnp.where(jnp.isfinite(dlb), dlb, jnp.float32(INF))
    return sort_blocks_by_distance(hit, jnp.broadcast_to(
        dlb[None, :], hit.shape))


def raster_hit(ts, view: ViewConstants, w: int, h: int,
               max_trace_steps=None) -> Hit:
    """Rasterize primary visibility -> per-pixel Hit (t, tri, u, v), flat in
    row-major pixel order (same contract as scene_trace_closest over camera
    rays)."""
    org, d = camera_rays(view, w, h)
    woop = ts.woop
    if woop is None or woop.get("cmin") is None:
        # no cluster table (tiny scene or BVH path): visibility via the
        # shared intersector, binning has nothing to cut
        from ..rt.trace import scene_trace_closest

        return scene_trace_closest(ts, org.reshape(-1, 3), d.reshape(-1, 3),
                                   max_steps=max_trace_steps)

    orgf = tile_order(org).reshape(-1, 3)
    df = tile_order(d).reshape(-1, 3)
    r = orgf.shape[0]

    if _use_pallas(ts):
        from ..ops.woop_pallas import (CULL_RAY_BLOCK, intersect_culled_pallas)

        rows = CULL_RAY_BLOCK // TILE_W
        rects = _block_screen_rects(woop["cmin64"], woop["cmax64"], view,
                                    w, h)
        mask = _overlap(_chunk_rects(w, h, rows), rects)
        # (nrb, C) unpadded lists; intersect_culled_pallas pads + flattens
        t, tri, u, v = intersect_culled_pallas(
            woop, orgf, df,
            block_lists=_mask_to_lists(mask, woop["cmin64"], woop["cmax64"],
                                       view.eye_position))
    else:
        from ..ops.woop import CULLED_RAY_BLOCK, intersect_brute

        rows = CULLED_RAY_BLOCK // TILE_W
        rects = _block_screen_rects(woop["cmin"], woop["cmax"], view, w, h)
        mask = _overlap(_chunk_rects(w, h, rows), rects)
        t, tri, u, v = intersect_brute(woop, orgf, df,
                                       ray_block=CULLED_RAY_BLOCK,
                                       chunk_cluster_mask=mask)
    hit = Hit(t=t, tri=tri, u=u, v=v)
    return jax.tree_util.tree_map(
        lambda x: untile_order(x, h, w).reshape(-1), hit)
