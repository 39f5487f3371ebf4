"""SSGI/SSAO: half-res screen-space ambient occlusion (GTAO flavor).

Role of `renderers/ssgi.rs` + `assets/shaders/ssgi/ssgi.hlsl`: half-res AO
from depth+normal, then spatial filter -> upsample -> temporal filter. As in
the reference it does NOT darken final lighting; it guides GI kernel sizes
and sample weighting (doc `gi-overview.md:368`).

TPU design: horizon sampling along 4 jittered directions with fixed step
counts — all static-shape gathers on a half-res lattice.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import img as im
from ..core import rng as rng_mod
from ..core.camera import ViewConstants
from ..ops import smallvec as smv
from .reprojection import reproject_image

_N_DIRS = 4
_N_STEPS = 4
_N_ROT = 4          # quantized kernel rotations (see ssao_half)
_RADIUS_PX = 24.0


def ssao_half(gb, view: ViewConstants, frame_idx, near: float = 0.01):
    """Half-res AO in [0,1]. Returns (h/2, w/2) f32."""
    h, w = gb["depth"].shape
    hh, hw = h // 2, w // 2
    depth_h = im.downsample_nearest(gb["depth"])
    normal_h = im.decimate2(gb["normal"])
    hit_h = im.decimate2(gb["hit"])
    vz = near / jnp.maximum(depth_h, 1e-12)

    uv = im.pixel_uv(hh, hw)
    # view-space position of each half-res pixel
    ndc = jnp.stack([uv[..., 0] * 2 - 1, 1 - uv[..., 1] * 2], axis=-1)
    c2v = view.clip_to_view
    # reversed-inf-Z: view pos = vz * ray through pixel
    vdir = smv.matvec(c2v[:3, :2], ndc) + c2v[:3, 2] + c2v[:3, 3]
    # normalize so that -z == 1
    vdir = vdir / jnp.maximum(-vdir[..., 2:3], 1e-8)
    vpos = vdir * vz[..., None]
    vnorm = smv.transform_dirs(view.world_to_view, normal_h)

    import math

    # blue-noise rotation pick: neighbor pixels land in different rotation
    # classes, so the Q-level banding dissolves into high-frequency error
    # (the reference rotates by blue noise too, ssgi.hlsl)
    from ..core import bluenoise

    u_rot = bluenoise.blue_noise_plane(hh, hw, frame_idx, stream=6)
    # Quantized per-pixel kernel rotation: with Q discrete rotations every
    # tap position becomes a STATIC pixel offset, so the depth fetch is a
    # shift (free on TPU) instead of a gather (~4 ms each at half res —
    # the XLA serial-gather path). Banding from Q=4 levels dissolves in the
    # temporal filter; the reference rotates per-pixel continuously but its
    # hardware gathers are free (`ssgi/ssgi.hlsl`).
    rot_k = jnp.minimum((u_rot * _N_ROT).astype(jnp.int32), _N_ROT - 1)

    # All DIRS x STEPS x ROT tap offsets, static. The tap math is written
    # ONCE over a stacked (D*S*K, hh, hw) axis (img.shift_stack) instead of
    # a 64x unrolled loop — bit-identical, ~60x smaller traced program.
    offs = []       # (dy, dx) shift offsets, and float (dv, du) uv deltas
    duv = []
    for d in range(_N_DIRS):
        for s in range(1, _N_STEPS + 1):
            r_px = _RADIUS_PX * (s / _N_STEPS) ** 1.5
            for k in range(_N_ROT):
                ang = (d + (k + 0.5) / _N_ROT) * (math.pi / _N_DIRS)
                dx = int(round(math.cos(ang) * r_px))
                dy = int(round(math.sin(ang) * r_px))
                offs.append((-dy, -dx))
                duv.append((dx / hw, dy / hh))
    D, S, K = _N_DIRS, _N_STEPS, _N_ROT
    taps = im.shift_stack(depth_h, offs).reshape(D, S, K, hh, hw)
    duv = jnp.asarray(duv, jnp.float32).reshape(D, S, K, 2)

    # per-pixel rotation select: collapse the K axis by rot_k
    sel = (rot_k[None] == jnp.arange(K)[:, None, None])              # (K,hh,hw)
    s_vz = near / jnp.maximum(
        jnp.sum(jnp.where(sel[None, None], taps, 0.0), axis=2), 1e-12)  # (D,S,hh,hw)
    duv_sel = jnp.sum(jnp.where(sel[None, None, :, :, :, None],
                                duv[:, :, :, None, None, :], 0.0), axis=2)

    suv = uv[None, None] + duv_sel                      # (D,S,hh,hw,2)
    s_ndc = jnp.stack([suv[..., 0] * 2 - 1, 1 - suv[..., 1] * 2], -1)
    s_vdir = smv.matvec(c2v[:3, :2], s_ndc) + c2v[:3, 2] + c2v[:3, 3]
    s_vdir = s_vdir / jnp.maximum(-s_vdir[..., 2:3], 1e-8)
    s_vpos = s_vdir * s_vz[..., None]
    delta = s_vpos - vpos[None, None]
    dist = jnp.linalg.norm(delta, axis=-1)
    cos_h = jnp.sum(delta * vnorm[None, None], axis=-1) / jnp.maximum(dist, 1e-6)
    # distance falloff keeps far geometry from occluding
    falloff = jnp.clip(1.0 - dist / (vz[None, None] * 0.3 + 0.3), 0.0, 1.0)
    horizon = jnp.maximum(cos_h, 0.0) * falloff         # (D,S,hh,hw)
    ao = 1.0 - horizon.max(axis=1).sum(axis=0) / _N_DIRS
    return jnp.where(hit_h, jnp.clip(ao, 0.0, 1.0), 1.0)


def init_state(h: int, w: int):
    return {"ssao_history": jnp.ones((h, w), jnp.float32)}


def ssao_pipeline(gb, view, frame_idx, state, reproj, near: float = 0.01):
    """ssao -> spatial (half) -> upsample -> temporal. Returns (ao (H,W), state)."""
    h, w = gb["depth"].shape
    ao_h = ssao_half(gb, view, frame_idx, near)
    ao_h = im.separable_blur(ao_h, im.GAUSS5)          # ssgi/spatial_filter.hlsl
    # depth/normal-aware upsample (ssgi/upsample.hlsl): plain bilinear
    # halos AO across depth edges, which then mis-guides RTDGI's filters
    from .rtdgi import _edge_aware_upsample

    ao = _edge_aware_upsample(ao_h[..., None], gb)[..., 0]
    prev = reproject_image(state["ssao_history"],
                           reproj, fallback=ao)        # ssgi/temporal_filter.hlsl
    out = prev * 0.85 + ao * 0.15
    out = jnp.where(gb["hit"], out, 1.0)
    return out, {"ssao_history": out}
