"""Secondary-hit radiance: lighting at GI/reflection ray hit points.

Role of the hit-lighting block shared by the reference's RT passes
(`rtdgi/trace_diffuse.rgen.hlsl`, `rtr/reflection.rgen.hlsl`, doc
`gi-overview.md:99-161`): at each secondary hit evaluate
  emissive + sun NEE (one shadow ray) + ambient from the irradiance cache
  (or sky-diffuse fallback) + screen-space reuse of last frame's lit image
  when the hit point is on screen (temporal feedback making GI multi-bounce).
On miss: atmosphere radiance.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..brdf import ggx
from ..core import img as im
from ..ops.smallvec import dot3
from ..rt.trace import scene_trace_shadow
from ..sky.env import sample_env
from ..world import hit_attributes

from ..core.profiling import pass_scope

RAY_EPS = 1e-4


def _project_to_uv(world_to_clip, p):
    from ..ops.smallvec import matvec

    clip = matvec(world_to_clip[:, :3], p) + world_to_clip[:, 3]
    w = jnp.maximum(clip[..., 3:4], 1e-8)
    ndc = clip[..., :2] / w
    uv = jnp.stack([0.5 + 0.5 * ndc[..., 0], 0.5 - 0.5 * ndc[..., 1]], -1)
    in_front = clip[..., 3] > 1e-6
    inb = ((uv[..., 0] > 0.0) & (uv[..., 0] < 1.0)
           & (uv[..., 1] > 0.0) & (uv[..., 1] < 1.0) & in_front)
    return uv, inb


def hit_radiance(ts, hit, ray_dir, sky_env, diffuse_env,
                 prev_lit=None, prev_depth=None, view=None,
                 ircache_lookup=None, max_trace_steps=None, near: float = 0.01,
                 rng=None, light_nee: bool = True,
                 full_shading: bool = False, return_aux: bool = False,
                 wrc_lookup=None, wrc_min_t: float = 20.0,
                 cone_width0=None, cone_spread: float = 0.033):
    """Radiance arriving along `ray_dir` from hit/miss points. (R,) rays.

    prev_lit/prev_depth + view enable screen-space radiance reuse (the
    reference reprojects last frame's `accum` when the hit lands on-screen,
    `gi-overview.md:127-147`). ircache_lookup(pos, normal) -> irradiance/pi
    supplies "infinite bounce" ambient; falls back to the convolved sky.
    When `rng` (uint32 (R,)) is given and the scene has emissive triangles,
    one NEE light sample + shadow ray is added (the reference's hit lighting
    includes emissive triangles, `gi-overview.md:99-161`).

    full_shading: interpolate vertex attributes and sample albedo textures
    at the hit (mip-biased — ray-cone LOD stand-in), matching the
    reference's `gbuffer.rchit.hlsl`. Default False = face normal +
    constant material color: ~2x cheaper per bounce ray (skips 3 vertex-row
    gathers + texture page fetches) at the cost of untextured GI color
    bleed. Threaded from `RenderConfig.secondary_full_shading`.
    """
    m = hit.hit_mask
    # secondary ray cone (`diffuse_trace_common.inc.hlsl:69-72`): width at
    # the hit = width at the ray origin + spread * t. cone_spread defaults
    # to the reference's reflected_cone_spread_angle (0.03) + a 1080p-ish
    # pixel angle; cone_width0, when the caller knows it, carries the
    # primary footprint (pixel_spread * eye distance).
    cw = cone_spread * jnp.where(m, hit.t, 1.0)
    if cone_width0 is not None:
        cw = cw + cone_width0
    with pass_scope("attrs"):
        attrs = hit_attributes(ts, hit, ray_dir, cone_width=cw,
                               full_shading=full_shading)
    pos, n = attrs["pos"], attrs["normal"]

    # --- sun direct at the hit (one shadow ray; the reference's 1 shadow/px)
    sun_dir = jnp.broadcast_to(ts.gpu.sun_direction, pos.shape)
    cos_s = jnp.maximum(dot3(n, sun_dir), 0.0)
    # hit points scatter across the scene -> a divergent shadow batch;
    # sort=True re-buckets them by origin cell (shared sun direction) so
    # the culled tracer's beams stay tight (ops/raysort.py)
    with pass_scope("sun_nee"):
        occ = scene_trace_shadow(
            ts, pos + attrs["geo_normal"] * RAY_EPS * 8, sun_dir,
            t_min=RAY_EPS, max_steps=max_trace_steps, sort=True)
    sun_vis = jnp.where(m & ~occ, cos_s, 0.0)
    albedo, _f0 = ggx.derive_lobes(attrs["base_color"], attrs["metallic"])
    direct = albedo / jnp.pi * ts.gpu.sun_radiance * sun_vis[:, None]

    # --- emissive triangle NEE (diffuse-only at secondary hits)
    if light_nee and rng is not None:
        from .lights import sample_triangle_light

        ls, rng = sample_triangle_light(ts, pos, rng)
        cos_g = dot3(n, ls["wi"])
        possible = m & ls["valid"] & (cos_g > 0.0)
        with pass_scope("light_nee"):
            occ_l = scene_trace_shadow(
                ts, pos + attrs["geo_normal"] * RAY_EPS * 8, ls["wi"],
                t_min=RAY_EPS, t_max=ls["dist"] - RAY_EPS * 10,
                max_steps=max_trace_steps, sort=True)
        contrib = (albedo / jnp.pi * ls["emission"]
                   * (jnp.maximum(cos_g, 0.0)
                      / jnp.maximum(ls["pdf_sa"], 1e-9))[:, None])
        direct = direct + jnp.where((possible & ~occ_l)[:, None], contrib, 0.0)

    # --- ambient: irradiance cache (preferred) or convolved sky
    with pass_scope("ambient"):
        if ircache_lookup is not None:
            amb_irr = ircache_lookup(pos, n)
        else:
            amb_irr = sample_env(diffuse_env, n)
    ambient = albedo * amb_irr

    radiance = attrs["emissive"] + direct + ambient

    # --- screen-space reuse of last frame's lit image
    if prev_lit is not None and view is not None and prev_depth is not None:
        uv, inb = _project_to_uv(view.world_to_clip_prev, pos)
        # lit+depth packed -> ONE gather (the pack is CSE'd across the
        # frame's hit_radiance calls); hit points project anywhere on
        # screen, so this stays on the XLA gather path (non-local)
        packed = jnp.concatenate([prev_lit, prev_depth[..., None]], axis=-1)
        with pass_scope("screen_reuse"):
            fetched = im.sample_nearest(packed, uv)
        reused, pd = fetched[:, :3], fetched[:, 3]
        # depth check: is the stored surface the one we hit?
        wv = view.world_to_view_prev
        vz_expected = -(wv[2, 0] * pos[..., 0] + wv[2, 1] * pos[..., 1]
                        + wv[2, 2] * pos[..., 2] + wv[2, 3])
        vz_stored = near / jnp.maximum(pd, 1e-12)
        same = jnp.abs(vz_stored / jnp.maximum(vz_expected, 1e-6) - 1.0) < 0.05
        use = (inb & same & m & (pd > 0))[:, None]
        radiance = jnp.where(use, reused, radiance)

    # --- world radiance cache for far-field hits: beyond `wrc_min_t` the
    # probe grid's radiance replaces the full shade (the reference keeps
    # WRC bound-but-dummy in every GI pass, `world_render_passes.rs:101-111`
    # / `wrc.rs:191-198`; when enabled this is its lookup site)
    if wrc_lookup is not None:
        far = m & (hit.t > wrc_min_t)
        radiance = jnp.where(far[:, None], wrc_lookup(pos, ray_dir), radiance)

    # --- miss: sky
    sky = sample_env(sky_env, ray_dir)
    out = jnp.where(m[:, None], radiance, sky)
    if return_aux:
        # reconnection data for ReSTIR reuse (`restir_spatial.hlsl` stores
        # hit point + hit normal to re-derive directions with a jacobian)
        return out, {"hit_pos": pos, "hit_geo_normal": attrs["geo_normal"]}
    return out
