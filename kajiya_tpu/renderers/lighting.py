"""Triangle-light specular sampling: direct specular from emissive meshes.

Role of `renderers/lighting.rs:25-88` + `assets/shaders/lighting/*`
(`sample_lights.rgen.hlsl`, `spatial_reuse_lights.hlsl`; wired at
`world_render_passes.rs:192-203` when emissive lights exist): reflection
rays rarely hit small emitters, so specular highlights from mesh lights are
sampled EXPLICITLY at half res with shadow rays, spatially reused, and added
into the reflection stream before its temporal/spatial filtering.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..brdf import ggx
from ..core import img as im
from ..core import rng as rng_mod
from ..rt.trace import scene_trace_shadow
from .lights import sample_triangle_light

RAY_EPS = 1e-4
N_SAMPLES = 2      # ~ the reference's 3 sample layers


def sample_lights_specular(ts, gb, frame_idx, max_trace_steps=None):
    """Half-res explicit specular from emissive triangles -> (hh, hw, 3).
    Returns zeros when the scene has no lights (cheap static path would need
    a host check; lanes are masked anyway)."""
    pos = im.decimate2(gb["pos"])
    n = im.decimate2(gb["normal"])
    gn = im.decimate2(gb["geo_normal"])
    rough = im.decimate2(gb["roughness"])
    metal = im.decimate2(gb["metallic"])
    albedo = im.decimate2(gb["albedo"])
    hitm = im.decimate2(gb["hit"])
    rd = im.decimate2(gb["ray_dir"])
    hh, hw = hitm.shape

    posf = pos.reshape(-1, 3)
    nf = n.reshape(-1, 3)
    gnf = gn.reshape(-1, 3)
    wo = -rd.reshape(-1, 3)
    base = albedo.reshape(-1, 3)
    mt = metal.reshape(-1)
    rg = rough.reshape(-1)
    hm = hitm.reshape(-1)

    px = jnp.arange(hh * hw, dtype=jnp.uint32)
    rng = rng_mod.pixel_rng(px % jnp.uint32(hw), px // jnp.uint32(hw),
                            jnp.uint32(frame_idx), stream=53)

    acc = jnp.zeros((hh * hw, 3), jnp.float32)
    for _ in range(N_SAMPLES):
        ls, rng = sample_triangle_light(ts, posf, rng)
        cos_g = jnp.sum(nf * ls["wi"], axis=-1)
        possible = hm & ls["valid"] & (cos_g > 0.0)
        occ = scene_trace_shadow(
            ts, posf + gnf * RAY_EPS * 8, ls["wi"],
            t_min=RAY_EPS, t_max=ls["dist"] - RAY_EPS * 10,
            max_steps=max_trace_steps)
        _albedo, f0 = ggx.derive_lobes(base, mt)
        f_spec, _pdf = ggx.specular_brdf(f0, rg, nf, wo, ls["wi"])
        contrib = (f_spec * ls["emission"]
                   * (jnp.maximum(cos_g, 0.0)
                      / jnp.maximum(ls["pdf_sa"], 1e-9))[:, None])
        acc = acc + jnp.where((possible & ~occ)[:, None], contrib, 0.0)
    out = (acc / N_SAMPLES).reshape(hh, hw, 3)
    # spatial reuse: small blur at half res (spatial_reuse_lights.hlsl role)
    return im.separable_blur(out, im.GAUSS5)
