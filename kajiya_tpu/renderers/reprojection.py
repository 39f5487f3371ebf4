"""Reprojection map: where was this pixel last frame, and is history valid?

Role of `renderers/reprojection.rs:6-52` + `calculate_reprojection_map.hlsl`:
from depth/normal/velocity and the previous depth buffer, produce per-pixel
  * prev_uv   — sampling position into last frame's buffers
  * validity  — [0,1] weight: 0 off-screen / disoccluded / normal flip
which every temporal pass (TAA, shadow denoise, SSGI, RTDGI, RTR) consumes.

Disocclusion test: reproject the current surface point into the previous
frame, compare against the previous depth buffer's view-z with a relative
tolerance (the plane-distance test of the HLSL kernel, simplified to a
view-z ratio test which is equivalent for small motion).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import img as im
from ..core.camera import ViewConstants


def calculate_reprojection_map(gb, prev_depth, view: ViewConstants,
                               near: float = 0.01):
    """Returns dict(prev_uv (H,W,2), validity (H,W), in_bounds (H,W))."""
    h, w = gb["depth"].shape
    uv = im.pixel_uv(h, w)
    prev_uv = uv + gb["velocity"]

    in_bounds = ((prev_uv[..., 0] >= 0.0) & (prev_uv[..., 0] < 1.0)
                 & (prev_uv[..., 1] >= 0.0) & (prev_uv[..., 1] < 1.0))

    # Expected view-z of this surface in the PREVIOUS frame: transform the
    # previous-frame world position. For static geometry pos_prev == pos.
    pos = gb["pos"]
    wv = view.world_to_view_prev
    vz_prev_expected = -(wv[2, 0] * pos[..., 0] + wv[2, 1] * pos[..., 1]
                         + wv[2, 2] * pos[..., 2] + wv[2, 3])

    prev_d = im.warp_nearest(prev_depth, prev_uv)
    vz_prev_stored = near / jnp.maximum(prev_d, 1e-12)

    ratio = vz_prev_stored / jnp.maximum(vz_prev_expected, 1e-6)
    depth_ok = jnp.abs(ratio - 1.0) < 0.05
    had_hit_prev = prev_d > 0.0

    validity = (in_bounds & depth_ok & had_hit_prev & gb["hit"]).astype(jnp.float32)
    return {"prev_uv": prev_uv, "validity": validity,
            "in_bounds": in_bounds.astype(jnp.float32)}


def reproject_image(history, reproj, fallback=None):
    """Bilinear-fetch history at prev_uv, falling back where invalid."""
    fetched = im.warp_bilinear(history, reproj["prev_uv"])
    v = reproj["validity"]
    if history.ndim == 3:
        v = v[..., None]
    if fallback is None:
        fallback = jnp.zeros_like(fetched)
    return fetched * v + fallback * (1.0 - v)


def reproject_planes(planes: dict, reproj):
    """Reproject several history planes with ONE wide gather: planes are
    concatenated channel-wise, fetched once, and split back. On TPU each
    gather pays per-element latency on its index stream — amortizing it
    across channels is a large win for the temporal passes."""
    keys = list(planes)
    parts, widths = [], []
    for k in keys:
        x = planes[k]
        if x.ndim == 2:
            x = x[..., None]
        parts.append(x)
        widths.append(x.shape[-1])
    packed = jnp.concatenate(parts, axis=-1)
    fetched = im.warp_bilinear(packed, reproj["prev_uv"])
    fetched = fetched * reproj["validity"][..., None]
    out = {}
    off = 0
    for k, w in zip(keys, widths):
        sl = fetched[..., off:off + w]
        out[k] = sl[..., 0] if planes[k].ndim == 2 else sl
        off += w
    return out
