"""Reference path tracer — the ground-truth oracle.

Behavioral counterpart of `assets/shaders/rt/reference_path_trace.rgen.hlsl`
(host: `renderers/reference.rs`, §3.4 of SURVEY.md): eye paths with a fixed
bounce budget (default 16), russian roulette from bounce 3, layered GGX BRDF
sampling, sun NEE with a soft solar disk, emissive triangle lights (NEE +
BRDF hits combined with the power heuristic), atmosphere on miss, progressive
accumulation handled by the caller via `accumulate`.

TPU design: the bounce loop is a `lax.scan` over a wavefront of ALL pixels
(static shapes; inactive lanes are masked, the classic wavefront formulation
of the megakernel loop at `reference_path_trace.rgen.hlsl:131`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.smallvec import dot3

from ..brdf import ggx
from ..brdf.sampling import power_heuristic, to_world, uniform_cone, uniform_triangle
from ..core import rng as rng_mod
from ..core.camera import camera_rays
from ..rt.trace import scene_trace_closest, scene_trace_shadow
from ..sky.atmosphere import sky_radiance
from ..world import TraceScene, hit_attributes

RAY_EPS = 1e-4


def _sample_sun(ts, rng):
    """Cone sample towards the sun disk. Returns (dir, rng')."""
    u1, rng = rng_mod.rand_u01(rng)
    u2, rng = rng_mod.rand_u01(rng)
    cos_max = jnp.cos(ts.gpu.sun_angular_radius)
    local = uniform_cone(u1, u2, cos_max)
    d = to_world(jnp.broadcast_to(ts.gpu.sun_direction, local.shape), local)
    return d, rng


from .lights import light_pdf_for_hit as _shared_light_pdf
from .lights import sample_triangle_light as _sample_light


def _light_pdf_for_hit(ts, hit, pos, wi):
    return _shared_light_pdf(ts, hit, wi)


def path_trace(
    ts: TraceScene,
    org,
    d,
    seed,
    num_bounces: int = 16,
    rr_start: int = 3,
    sun_nee: bool = True,
    light_nee: bool = True,
    max_trace_steps=None,
    sky_fn=None,
    cone_spread=None,
):
    """Trace one path per input ray. org/d: (R, 3); seed: (R,) uint32.
    Returns radiance (R, 3).

    cone_spread: per-ray footprint angle for ray-cone texture LOD — the
    cone width at each hit is cone_spread * cumulative path distance (the
    reference PT carries a RayCone the same way,
    `reference_path_trace.rgen.hlsl:123-152`). None = mip 0 everywhere."""
    R = org.shape[0]
    state = dict(
        org=org,
        d=d,
        throughput=jnp.ones((R, 3), jnp.float32),
        radiance=jnp.zeros((R, 3), jnp.float32),
        rng=jnp.asarray(seed, jnp.uint32),
        active=jnp.ones((R,), bool),
        prev_pdf=jnp.full((R,), 1e8, jnp.float32),  # ~delta: camera rays get full emission
        path_t=jnp.zeros((R,), jnp.float32),
    )

    def bounce(state, bounce_idx):
        org, d, rng = state["org"], state["d"], state["rng"]
        act = state["active"]
        tp, radiance = state["throughput"], state["radiance"]

        # bounce wavefronts diverge after the first segment; sorted tracing
        # keeps the culled tracer's chunks beam-shaped (ops/raysort.py)
        hit = scene_trace_closest(ts, org, d, t_min=RAY_EPS,
                            max_steps=max_trace_steps, sort=True)
        m = hit.hit_mask & act

        # ------- miss: sky (sky_fn hook ~ the PT shader's FURNACE_TEST consts,
        # `reference_path_trace.rgen.hlsl:29-43`)
        sky = sky_radiance(d, ts.gpu.sun_direction) if sky_fn is None else sky_fn(d)
        radiance = radiance + jnp.where(
            (act & ~hit.hit_mask)[:, None], tp * sky, 0.0)

        path_t = state["path_t"] + jnp.where(m, hit.t, 0.0)
        cw = None if cone_spread is None else cone_spread * path_t
        attrs = hit_attributes(ts, hit, d, cone_width=cw)
        pos, n = attrs["pos"], attrs["normal"]
        wo = -d

        # ------- emissive hit, MIS-weighted against NEE
        emit = attrs["emissive"]
        if light_nee:
            pdf_l = _light_pdf_for_hit(ts, hit, pos, d)
            w_mis = jnp.where(pdf_l > 0.0,
                              power_heuristic(state["prev_pdf"], pdf_l), 1.0)
        else:
            w_mis = jnp.ones((R,), jnp.float32)
        radiance = radiance + jnp.where(m[:, None], tp * emit * w_mis[:, None], 0.0)

        bc, metal, rough = attrs["base_color"], attrs["metallic"], attrs["roughness"]

        # ------- sun NEE (soft disk; pdf cancels against disk radiance)
        if sun_nee:
            sun_dir, rng = _sample_sun(ts, rng)
            cos_s = dot3(n, sun_dir)
            sun_possible = m & (cos_s > 0.0)
            occ = scene_trace_shadow(
                ts,
                pos + attrs["geo_normal"] * RAY_EPS * 4, sun_dir,
                t_min=RAY_EPS, max_steps=max_trace_steps, sort=True)
            f = ggx.eval_layered(bc, metal, rough, n, wo, sun_dir)
            contrib = tp * f * ts.gpu.sun_radiance * jnp.maximum(cos_s, 0.0)[:, None]
            radiance = radiance + jnp.where(
                (sun_possible & ~occ)[:, None], contrib, 0.0)

        # ------- emissive triangle NEE with MIS
        if light_nee:
            ls, rng = _sample_light(ts, pos, rng)
            cos_s = jnp.sum(n * ls["wi"], axis=-1)
            possible = m & ls["valid"] & (cos_s > 0.0)
            occ = scene_trace_shadow(
                ts,
                pos + attrs["geo_normal"] * RAY_EPS * 4, ls["wi"],
                t_min=RAY_EPS, t_max=ls["dist"] - RAY_EPS * 10,
                max_steps=max_trace_steps, sort=True)
            f = ggx.eval_layered(bc, metal, rough, n, wo, ls["wi"])
            pdf_b = ggx.pdf_layered(bc, metal, rough, n, wo, ls["wi"])
            w_l = power_heuristic(ls["pdf_sa"], pdf_b)
            contrib = (tp * f * ls["emission"] * (jnp.maximum(cos_s, 0.0) * w_l
                       / jnp.maximum(ls["pdf_sa"], 1e-9))[:, None])
            radiance = radiance + jnp.where((possible & ~occ)[:, None], contrib, 0.0)

        # ------- continue the path: sample the layered BRDF
        ul, rng = rng_mod.rand_u01(rng)
        u1, rng = rng_mod.rand_u01(rng)
        u2, rng = rng_mod.rand_u01(rng)
        wi, pdf, f = ggx.sample_layered(bc, metal, rough, n, wo, ul, u1, u2)
        cos_i = jnp.maximum(jnp.sum(n * wi, axis=-1), 0.0)
        tp_next = tp * f * (cos_i / jnp.maximum(pdf, 1e-9))[:, None]
        ok = m & (pdf > 1e-9) & (cos_i > 0.0)

        # ------- russian roulette (from bounce `rr_start`, as in the reference)
        u_rr, rng = rng_mod.rand_u01(rng)
        p_cont = jnp.clip(jnp.max(tp_next, axis=-1), 0.05, 1.0)
        do_rr = bounce_idx >= rr_start
        survive = jnp.where(do_rr, u_rr < p_cont, True)
        tp_next = jnp.where(do_rr, tp_next / p_cont[:, None], tp_next)

        new_state = dict(
            org=jnp.where(ok[:, None], pos + attrs["geo_normal"] * RAY_EPS * 4, org),
            d=jnp.where(ok[:, None], wi, d),
            throughput=jnp.where(ok[:, None], tp_next, tp),
            radiance=radiance,
            rng=rng,
            active=ok & survive,
            prev_pdf=jnp.where(ok, pdf, state["prev_pdf"]),
            path_t=path_t,
        )
        return new_state, None

    state, _ = jax.lax.scan(bounce, state, jnp.arange(num_bounces))
    rad = state["radiance"]
    # firefly suppression, cf. the reference's roughness-biasing intent
    return jnp.clip(rad, 0.0, 1e4)


PIXEL_FILTER_SIGMA = 0.4    # gaussian pixel filter, like the reference PT


def render_sample(ts, view, width, height, frame_idx, spp_chunk: int = 1,
                  pixel_filter: bool = True, **pt_kwargs):
    """One progressive sample pass over the full frame -> (H, W, 3) radiance.

    Each sample traces through a fresh gaussian sub-pixel offset (the
    reference's per-sample jitter + gaussian pixel filter,
    `reference_path_trace.rgen.hlsl:20-150`) so the converged image is
    antialiased ground truth rather than pixel-center point samples."""
    acc = jnp.zeros((width * height, 3), jnp.float32)
    px = jnp.arange(width * height, dtype=jnp.uint32)
    for s in range(spp_chunk):
        seed = rng_mod.hash3(px, jnp.uint32(frame_idx), jnp.uint32(s))
        if pixel_filter:
            u1, seed = rng_mod.rand_u01(seed)
            u2, seed = rng_mod.rand_u01(seed)
            # Box-Muller -> gaussian offsets in pixels
            r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
            ang = 2.0 * jnp.pi * u2
            jit = (jnp.stack([r * jnp.cos(ang), r * jnp.sin(ang)], axis=-1)
                   * PIXEL_FILTER_SIGMA).reshape(height, width, 2)
        else:
            jit = None
        org, d = camera_rays(view, width, height, jitter_px=jit)
        acc = acc + path_trace(ts, org.reshape(-1, 3), d.reshape(-1, 3),
                               seed, **pt_kwargs)
    return (acc / spp_chunk).reshape(height, width, 3)


def accumulate(accum, new_frame, sample_count):
    """Progressive accumulation (the `refpt.accum` temporal image,
    `world_render_passes.rs:299-308`). accum: (H, W, 3); returns updated pair."""
    total = sample_count + 1.0
    return accum + (new_frame - accum) / total, total
