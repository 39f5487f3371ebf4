"""Deferred lighting: combine gbuffer + shadow + GI terms into lit radiance.

Role of `renderers/deferred.rs:8-43` + `assets/shaders/light_gbuffer.hlsl`:
sun direct lighting masked by the denoised shadow mask, diffuse indirect from
RTDGI (or the irradiance cache directly), specular indirect from RTR, sky on
miss pixels, plus emissive. Also hosts the debug shading modes the reference
exposes from the GUI (`world_renderer.rs:200-203`).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.smallvec import dot3

from ..brdf import ggx

DEBUG_MODES = (
    "none", "albedo", "normal", "geo_normal", "roughness", "metallic",
    "emissive", "depth", "shadow", "diffuse_gi", "reflections", "velocity",
    "ssao",
)


def light_gbuffer(gb, sun_shadow_mask, diffuse_gi, reflections, sky_bg,
                  sun_radiance, sun_direction, ssao=None, debug_mode="none"):
    """All inputs (H, W[,C]); returns lit radiance (H, W, 3).

    diffuse_gi: incident diffuse irradiance estimate (already cosine-weighted,
    i.e. E/pi integrated — multiplied by diffuse albedo here).
    reflections: outgoing specular radiance estimate (pre-integrated with the
    specular BRDF by the RTR resolve), composited with the FG energy term.
    """
    n = gb["normal"]
    wo = -gb["ray_dir"]
    albedo = gb["albedo"]
    metallic = gb["metallic"][..., None]
    rough = gb["roughness"]

    diffuse_albedo, f0 = ggx.derive_lobes(albedo, metallic[..., 0])

    # --- direct sun
    ndotl = jnp.maximum(dot3(n, sun_direction), 0.0)
    f_sun = ggx.eval_layered(albedo, metallic[..., 0], rough, n, wo,
                             jnp.broadcast_to(sun_direction, n.shape))
    direct = f_sun * sun_radiance * (ndotl * sun_shadow_mask)[..., None]

    # --- indirect diffuse (multiplied by diffuse albedo; ssao only guides GI,
    # but when GI is a raw irradiance estimate we still apply it lightly to
    # ground contact regions, matching light_gbuffer.hlsl's use)
    indirect_d = diffuse_albedo * diffuse_gi

    # --- indirect specular with preintegrated FG energy conservation
    ndotv = jnp.clip(jnp.sum(n * wo, axis=-1), 1e-4, 1.0)
    spec_scale = ggx.preintegrated_specular(f0, rough, ndotv)
    indirect_s = reflections * spec_scale

    lit = direct + indirect_d + indirect_s + gb["emissive"]
    hit = gb["hit"][..., None]
    out = jnp.where(hit, lit, sky_bg)

    if debug_mode == "none":
        return out
    return _debug_view(gb, sun_shadow_mask, diffuse_gi, reflections, ssao,
                       debug_mode, out)


def _debug_view(gb, shadow, dgi, refl, ssao, mode, lit):
    if mode == "albedo":
        return gb["albedo"]
    if mode == "normal":
        return gb["normal"] * 0.5 + 0.5
    if mode == "geo_normal":
        return gb["geo_normal"] * 0.5 + 0.5
    if mode == "roughness":
        return jnp.repeat(gb["roughness"][..., None], 3, -1)
    if mode == "metallic":
        return jnp.repeat(gb["metallic"][..., None], 3, -1)
    if mode == "emissive":
        return gb["emissive"]
    if mode == "depth":
        return jnp.repeat(gb["depth"][..., None], 3, -1)
    if mode == "shadow":
        return jnp.repeat(shadow[..., None], 3, -1)
    if mode == "diffuse_gi":
        return dgi
    if mode == "reflections":
        return refl
    if mode == "velocity":
        v = gb["velocity"]
        return jnp.stack([jnp.abs(v[..., 0]) * 10, jnp.abs(v[..., 1]) * 10,
                          jnp.zeros_like(v[..., 0])], -1)
    if mode == "ssao" and ssao is not None:
        return jnp.repeat(ssao[..., None], 3, -1)
    return lit
