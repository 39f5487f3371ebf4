"""Depth of field: circle-of-confusion + gather blur.

Role of `renderers/dof.rs:5-41` (`dof/coc.hlsl`, `dof/gather.hlsl`) — present
in the reference but not wired into the main graph (`world_render_passes.rs:250`
is commented out); provided here with the same opt-in status.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import img as im

N_TAPS = 12


def circle_of_confusion(depth, focus_dist: float, aperture: float,
                        near: float = 0.01, max_coc_px: float = 12.0):
    """Signed CoC radius in pixels from reversed-Z depth."""
    vz = near / jnp.maximum(depth, 1e-12)
    coc = aperture * (vz - focus_dist) / jnp.maximum(vz, 1e-4)
    return jnp.clip(coc, -max_coc_px, max_coc_px)


def dof_gather(color, depth, focus_dist: float, aperture: float,
               near: float = 0.01):
    """Scatter-as-gather disk blur weighted by CoC overlap."""
    h, w = color.shape[:2]
    coc = circle_of_confusion(depth, focus_dist, aperture, near)
    uv = im.pixel_uv(h, w)
    acc = jnp.zeros_like(color)
    wsum = jnp.zeros((h, w, 1), jnp.float32)
    # golden-angle spiral taps
    ga = 2.39996
    for i in range(N_TAPS):
        r = jnp.sqrt((i + 0.5) / N_TAPS)
        a = i * ga
        off = jnp.stack([jnp.cos(a) * r, jnp.sin(a) * r]) / jnp.asarray(
            [w, h], jnp.float32)
        suv = uv + off * jnp.abs(coc)[..., None]
        c = im.sample_bilinear(color, suv)
        s_coc = im.sample_bilinear(jnp.abs(coc), suv)
        # a sample contributes if its own CoC reaches back to this pixel
        wgt = jnp.clip(s_coc / jnp.maximum(jnp.abs(coc), 1e-3), 0.0, 1.0)[..., None]
        acc = acc + c * wgt
        wsum = wsum + wgt
    return acc / jnp.maximum(wsum, 1e-6)
