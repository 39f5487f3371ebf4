"""RTR — ray-traced reflections (half-res, VNDF-sampled) with temporal reuse.

Role of `renderers/rtr.rs:90-400` + `assets/shaders/rtr/*`
(doc `gi-overview.md:302-350`): half-res GGX VNDF reflection rays, hit
lighting, ReSTIR-temporal reuse, BRDF-footprint resolve to full res,
temporal filter, ray-length output for contact hardening.

v1 implements trace + joint-bilateral resolve + temporal filter with
roughness-aware accumulation; the reservoir exchange upgrades in restir.py.
Output = pre-integrated outgoing specular radiance; the deferred combine
multiplies the preintegrated-FG energy term (split-sum, deferred.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..brdf import ggx
from ..core import img as im
from ..core import rng as rng_mod
from .hit_lighting import hit_radiance
from .reprojection import reproject_image, reproject_planes
from ..rt.trace import scene_trace_closest

RAY_EPS = 1e-4


def init_state(h: int, w: int):
    return {
        "rtr_history": jnp.zeros((h, w, 3), jnp.float32),
        "rtr_hist_len": jnp.zeros((h, w), jnp.float32),
        "rtr_ray_len": jnp.zeros((h, w), jnp.float32),
    }


def trace_reflections(ts, gb, frame_idx, sky_env, diffuse_env,
                      prev_lit=None, prev_depth=None, view=None,
                      ircache_lookup=None, max_trace_steps=None):
    """Half-res reflection trace (`reflection.rgen.hlsl`): one VNDF ray per
    half-res pixel. Returns dict(radiance, ray_t, wi, valid) at half res."""
    pos = gb["pos"][::2, ::2]
    n = gb["normal"][::2, ::2]
    gn = gb["geo_normal"][::2, ::2]
    rough = gb["roughness"][::2, ::2]
    hitm = gb["hit"][::2, ::2]
    rd = gb["ray_dir"][::2, ::2]
    hh, hw = hitm.shape

    px = jnp.arange(hh * hw, dtype=jnp.uint32)
    rng = rng_mod.pixel_rng(px % jnp.uint32(hw), px // jnp.uint32(hw),
                            jnp.uint32(frame_idx), stream=31)
    u1, rng = rng_mod.rand_u01(rng)
    u2, rng = rng_mod.rand_u01(rng)

    nf = n.reshape(-1, 3)
    wo = -rd.reshape(-1, 3)
    wi = ggx.sample_vndf(rough.reshape(-1), nf, wo, u1, u2)
    # reflect below-horizon samples back up
    below = jnp.sum(wi * nf, axis=-1) < 1e-4
    wi = jnp.where(below[:, None],
                   wi - 2.0 * jnp.sum(wi * nf, -1, keepdims=True) * nf, wi)
    wi = wi / jnp.maximum(jnp.linalg.norm(wi, axis=-1, keepdims=True), 1e-12)

    org = pos.reshape(-1, 3) + gn.reshape(-1, 3) * RAY_EPS * 8
    hit = scene_trace_closest(ts, org, wi, t_min=RAY_EPS,
                        max_steps=max_trace_steps)
    rad = hit_radiance(ts, hit, wi, sky_env, diffuse_env,
                       prev_lit=prev_lit, prev_depth=prev_depth, view=view,
                       ircache_lookup=ircache_lookup,
                       max_trace_steps=max_trace_steps, rng=rng)
    valid = hitm.reshape(-1)
    return {
        "radiance": jnp.where(valid[:, None], rad, 0.0).reshape(hh, hw, 3),
        "ray_t": jnp.minimum(hit.t, 1e8).reshape(hh, hw),
        "wi": wi.reshape(hh, hw, 3),
        "valid": valid.reshape(hh, hw),
    }


def _resolve_full(half, gb, near: float = 0.01):
    """Half->full joint-bilateral resolve, roughness-aware (role of
    `rtr/resolve.hlsl`'s BRDF-footprint gather) — gather-free phase weave."""
    vz = near / jnp.maximum(gb["depth"], 1e-12)
    vz_h = near / jnp.maximum(gb["depth"][::2, ::2], 1e-12)
    n_full = gb["normal"]
    n_h = gb["normal"][::2, ::2]

    v_taps, weights = im.half_to_full_taps(half["radiance"])
    t_taps, _ = im.half_to_full_taps(half["ray_t"])
    z_taps, _ = im.half_to_full_taps(vz_h)
    n_taps, _ = im.half_to_full_taps(n_h)

    acc = jnp.zeros_like(v_taps[0])
    acct = jnp.zeros_like(t_taps[0])
    accw = jnp.zeros_like(t_taps[0])
    for v, t, zz, nn, bw in zip(v_taps, t_taps, z_taps, n_taps, weights):
        w_z = jnp.exp(-jnp.abs(zz - vz) / (0.05 * vz + 1e-4))
        w_n = jnp.maximum(jnp.sum(nn * n_full, axis=-1), 0.0) ** 16
        wt = bw * w_z * w_n + 1e-6
        acc = acc + v * wt[..., None]
        acct = acct + t * wt
        accw = accw + wt
    return acc / accw[..., None], acct / accw


def rtr_pipeline(ts, gb, view, frame_idx, state, reproj, sky_env, diffuse_env,
                 prev_lit=None, prev_depth=None, ircache_lookup=None,
                 max_trace_steps=None, half=None, mesh_light_specular=False):
    """Full chain -> (specular radiance (H, W, 3), new_state)."""
    if half is None:
        half = trace_reflections(
            ts, gb, frame_idx, sky_env, diffuse_env, prev_lit=prev_lit,
            prev_depth=prev_depth, view=view, ircache_lookup=ircache_lookup,
            max_trace_steps=max_trace_steps)

    if mesh_light_specular:
        # explicit emissive-triangle specular added into the reflection
        # stream pre-filtering (world_render_passes.rs:192-203)
        from .lighting import sample_lights_specular

        half = dict(half)
        half["radiance"] = half["radiance"] + sample_lights_specular(
            ts, gb, frame_idx, max_trace_steps=max_trace_steps)

    full, ray_len = _resolve_full(half, gb)

    # temporal: rougher surfaces tolerate longer history; mirrors converge
    # fast anyway (temporal_filter.hlsl + spatial_cleanup.hlsl roles)
    fetched = reproject_planes(
        {"h": state["rtr_history"], "l": state["rtr_hist_len"]}, reproj)
    hist = fetched["h"]
    hist_len = fetched["l"]
    max_len = 4.0 + gb["roughness"] * 24.0
    hist_len = jnp.minimum(hist_len * reproj["validity"] + 1.0, max_len)
    alpha = (1.0 / hist_len)[..., None]
    out = hist * (1 - alpha) + full * alpha

    m1, var = im.local_moments_3x3(full)
    sigma = jnp.sqrt(jnp.maximum(var, 0.0))
    out = jnp.clip(out, m1 - sigma * 3.0 - 1e-3, m1 + sigma * 3.0 + 1e-3)

    new_state = {
        "rtr_history": out,
        "rtr_hist_len": hist_len,
        "rtr_ray_len": ray_len,
    }
    return out, new_state
