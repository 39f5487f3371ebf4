"""RTDGI — ray-traced diffuse final gather (half-res) with temporal reuse.

Role of `renderers/rtdgi.rs` + `assets/shaders/rtdgi/*` (ReSTIR GI,
doc `gi-overview.md:97-177`): trace half-res cosine-hemisphere candidate
rays, light the hits (hit_lighting.py), reuse temporally via reprojection,
filter spatially, and resolve to full resolution guided by depth/normal.

This module implements the candidate-trace + temporal/spatial filter
chain; the ReSTIR reservoir exchange (restir_temporal/spatial/resolve)
lives in `restir_gi.py` and upgrades the candidate stream in place.
Output = incident diffuse irradiance / pi ("E/pi"), to be multiplied by the
diffuse albedo in the deferred combine (light_gbuffer.hlsl convention).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.profiling import pass_scope

from ..brdf.sampling import cosine_hemisphere, to_world
from ..core import img as im
from ..core import rng as rng_mod
from .hit_lighting import hit_radiance
from .reprojection import reproject_image, reproject_planes
from ..rt.trace import scene_trace_closest

RAY_EPS = 1e-4
SKY_DIST = 1e4      # virtual hit distance for sky misses (reconnection)


def init_state(h: int, w: int):
    return {
        "rtdgi_history": jnp.zeros((h, w, 3), jnp.float32),
        "rtdgi_hist_len": jnp.zeros((h, w), jnp.float32),
    }


def _half(gb):
    return {
        "pos": im.decimate2(gb["pos"]),
        "normal": im.decimate2(gb["normal"]),
        "geo_normal": im.decimate2(gb["geo_normal"]),
        "hit": im.decimate2(gb["hit"]),
        "depth": im.decimate2(gb["depth"]),
    }


half_gbuffer = _half   # public: frame.py builds the shared ray wavefront


def candidate_rays(gb_h, frame_idx):
    """Half-res candidate ray batch (`trace_diffuse.rgen.hlsl`): one cosine
    ray per half-res pixel. Returns (org, wi, rng) flat; the frame batches
    these into the shared secondary trace+shade wavefront."""
    hh, hw = gb_h["hit"].shape
    px = jnp.arange(hh * hw, dtype=jnp.uint32)
    rng = rng_mod.pixel_rng(px % jnp.uint32(hw), px // jnp.uint32(hw),
                            jnp.uint32(frame_idx), stream=23)
    # blue-noise hemisphere sample (reference feeds trace_diffuse from its
    # blue-noise LUT): candidate directions decorrelate between neighbors,
    # which ReSTIR spatial reuse turns directly into lower resolve variance
    from ..core import bluenoise

    bu1, bu2 = bluenoise.blue_noise_pair(hh, hw, frame_idx, stream=1)
    u1 = bu1.reshape(-1)
    u2 = bu2.reshape(-1)

    n = gb_h["normal"].reshape(-1, 3)
    gn = gb_h["geo_normal"].reshape(-1, 3)
    pos = gb_h["pos"].reshape(-1, 3)
    wi = to_world(n, cosine_hemisphere(u1, u2))
    org = pos + gn * RAY_EPS * 8
    return org, wi, rng


def finish_candidates(gb_h, org, wi, hit_mask, hit_t, rad, aux):
    """Assemble the candidate dict from the shared wavefront's results."""
    hh, hw = gb_h["hit"].shape
    valid = gb_h["hit"].reshape(-1)
    # reconnection data: real hit point (or a far virtual point for sky
    # misses, jacobian ~1 there) + hit-surface normal, the payload ReSTIR
    # reuse re-derives directions from (`restir_spatial.hlsl`)
    m = hit_mask[:, None]
    hit_pos = jnp.where(m, aux["hit_pos"], org + wi * SKY_DIST)
    hit_n = jnp.where(m, aux["hit_geo_normal"], -wi)
    # cosine-weighted estimator of E/pi is simply the sampled radiance
    return {
        "radiance": jnp.where(valid[:, None], rad, 0.0).reshape(hh, hw, 3),
        "ray_dir": wi.reshape(hh, hw, 3),
        "ray_t": jnp.minimum(hit_t, 1e8).reshape(hh, hw),
        "hit_pos": hit_pos.reshape(hh, hw, 3),
        "hit_normal": hit_n.reshape(hh, hw, 3),
        "valid": valid.reshape(hh, hw),
    }


def trace_candidates(ts, gb_h, frame_idx, sky_env, diffuse_env,
                     prev_lit=None, prev_depth=None, view=None,
                     ircache_lookup=None, max_trace_steps=None,
                     secondary_full_shading: bool = False):
    """Standalone half-res candidate trace (tests / non-batched callers);
    the frame path batches candidate_rays into one shared wavefront."""
    org, wi, rng = candidate_rays(gb_h, frame_idx)
    hit = scene_trace_closest(ts, org, wi, t_min=RAY_EPS,
                        max_steps=max_trace_steps)
    rad, aux = hit_radiance(ts, hit, wi, sky_env, diffuse_env,
                            prev_lit=prev_lit, prev_depth=prev_depth,
                            view=view, ircache_lookup=ircache_lookup,
                            max_trace_steps=max_trace_steps, rng=rng,
                            full_shading=secondary_full_shading,
                            return_aux=True)
    return finish_candidates(gb_h, org, wi, hit.hit_mask, hit.t, rad, aux)


def _edge_aware_upsample(half_img, gb, near: float = 0.01):
    """Half->full resolve guided by depth+normal (restir_resolve.hlsl's
    role): joint-bilateral over the 4-tap footprint.

    PHASE-MAJOR form (round-4 profile: the interleaved-taps version spent
    ~9 ms/frame in (H/2, 2, W/2, 2) relayout copies at 1080p): all tap math
    runs on half-res phase planes — taps are cheap static half-res shifts,
    the full-res guides are MXU phase extracts — and the four finished
    phases are woven once at the end (im.weave2x2). Values are identical:
    one-hot selection keeps exact f32, and per-phase tap weights are the
    same scalars the interleaved weight planes tiled."""
    vz = near / jnp.maximum(gb["depth"], 1e-12)
    vz_h = near / jnp.maximum(im.decimate2(gb["depth"]), 1e-12)
    n_full = gb["normal"]
    n_h = im.decimate2(gb["normal"])

    # all 9 half-res shifts once (ky-1+py, kx-1+px ranges over -1..1)
    offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    v_s = im.shift_stack(half_img, offs)
    z_s = im.shift_stack(vz_h, offs)
    n_s = im.shift_stack(n_h, offs)

    def idx(dy, dx):
        return (dy + 1) * 3 + (dx + 1)

    phases = {}
    for py in (0, 1):
        for px in (0, 1):
            vz_p = im.phase_extract(vz, py, px)
            n_p = im.phase_extract(n_full, py, px)
            acc = jnp.zeros_like(v_s[0])
            accw = jnp.zeros(v_s[0].shape[:2], jnp.float32)
            for ky in (0, 1):
                wy = (0.25, 0.75)[py] if ky == 0 else (0.75, 0.25)[py]
                for kx in (0, 1):
                    wx = (0.25, 0.75)[px] if kx == 0 else (0.75, 0.25)[px]
                    k = idx(ky - 1 + py, kx - 1 + px)
                    w_z = jnp.exp(-jnp.abs(z_s[k] - vz_p)
                                  / (0.05 * vz_p + 1e-4))
                    w_n = jnp.maximum(jnp.sum(n_s[k] * n_p, axis=-1),
                                      0.0) ** 8
                    wt = wy * wx * w_z * w_n + 1e-6
                    acc = acc + v_s[k] * wt[..., None]
                    accw = accw + wt
            phases[(py, px)] = acc / accw[..., None]
    return im.weave2x2([[phases[(0, 0)], phases[(0, 1)]],
                        [phases[(1, 0)], phases[(1, 1)]]])


def rtdgi_pipeline(ts, gb, view, frame_idx, state, reproj, sky_env,
                   diffuse_env, ssao=None, prev_lit=None, prev_depth=None,
                   ircache_lookup=None, max_trace_steps=None,
                   use_restir: bool = True, restir_state=None,
                   secondary_full_shading: bool = False,
                   candidates=None, invalidity=None,
                   validated: bool = False):
    """Full chain -> (diffuse E/pi (H, W, 3), new_state, new_restir_state).

    candidates/invalidity: precomputed by the frame's shared secondary-ray
    wavefront (frame.py batches candidate + validation rays of all GI
    passes into ONE trace+shade); when absent, traced/validated here
    standalone (tests, non-batched callers). `validated` marks the
    reservoir state as already validated by the frame."""
    gb_h = _half(gb)
    if candidates is None:
        candidates = trace_candidates(
            ts, gb_h, frame_idx, sky_env, diffuse_env, prev_lit=prev_lit,
            prev_depth=prev_depth, view=view, ircache_lookup=ircache_lookup,
            max_trace_steps=max_trace_steps,
            secondary_full_shading=secondary_full_shading)

    if use_restir and restir_state is not None:
        import jax

        from . import restir_gi

        # every-3rd-frame path validation (diffuse_validate.rgen.hlsl):
        # re-trace stored reservoir rays at quarter res, replace/cut stale
        # history BEFORE the temporal exchange
        if not validated and invalidity is None:
            def do_validate(rs):
                return restir_gi.validate_reservoirs(
                    ts, rs, gb_h, sky_env, diffuse_env, frame_idx,
                    prev_lit=prev_lit, prev_depth=prev_depth, view=view,
                    ircache_lookup=ircache_lookup,
                    max_trace_steps=max_trace_steps,
                    secondary_full_shading=secondary_full_shading)

            def no_validate(rs):
                hh, hw = rs["gi_res_w_sum"].shape
                return rs, jnp.zeros((hh, hw), jnp.float32)

            restir_state, invalidity = jax.lax.cond(
                jnp.asarray(frame_idx) % restir_gi.VALIDATE_PERIOD == 0,
                do_validate, no_validate, restir_state)

        with pass_scope("restir"):
            res, new_restir_state = restir_gi.restir_diffuse(
                restir_state, candidates, gb_h, reproj, frame_idx,
                ssao_h=None if ssao is None else im.decimate2(ssao),
                view=view)
        # the near/far split is SCREEN-SPACE by construction (an 80 px
        # near-field window, `near_field_settings.hlsl`): at production
        # resolutions it covers true contact scale, but below ~480 rows it
        # would swallow whole test scenes and push the emitter's energy
        # onto the unsmoothed 1-spp candidate term — so it engages only at
        # real resolutions
        split = gb["depth"].shape[0] >= 480
        with pass_scope("resolve"):
            full = restir_gi.resolve(res, gb,
                                     candidates=candidates if split else None,
                                     ssao=ssao if split else None)
    else:
        new_restir_state = restir_state
        # spatial pre-filter at half res (smoothing role of the ReSTIR
        # spatial passes for the plain path)
        rad_h = im.separable_blur(candidates["radiance"], im.GAUSS5)
        full = _edge_aware_upsample(rad_h, gb)

    # temporal accumulation at full res (temporal_filter.hlsl)
    with pass_scope("temporal"):
        fetched = reproject_planes(
            {"h": state["rtdgi_history"], "l": state["rtdgi_hist_len"]},
            reproj)
    hist = fetched["h"]
    hist_len = fetched["l"]
    hist_len = jnp.minimum(hist_len * reproj["validity"] + 1.0, 24.0)
    if invalidity is not None:
        # validation invalidity cuts the temporal filter's history (role of
        # temporal_validity_integrate.hlsl): a fully-invalidated pixel
        # restarts accumulation instead of ghosting for 24 frames
        inv_full = jnp.repeat(jnp.repeat(invalidity, 2, 0), 2, 1)[
            :hist_len.shape[0], :hist_len.shape[1]]
        hist_len = jnp.maximum(hist_len * (1.0 - inv_full), 1.0)
    alpha = (1.0 / hist_len)[..., None]
    out = hist * (1 - alpha) + full * alpha

    # variance clamp against the spatial neighborhood to cut ghosting. The
    # band includes a relative term: a pure n-sigma box around the CURRENT
    # frame's local mean systematically clips the converged history whenever
    # this frame's neighborhood missed the (rare, bright) light-carrying
    # samples — measured ~30% GI energy loss on the cornell box without it
    m1, var = im.local_moments_3x3(full)
    sigma = jnp.sqrt(jnp.maximum(var, 0.0))
    band = sigma * 3.0 + 0.15 * m1 + 1e-3
    out = jnp.clip(out, m1 - band, m1 + band)

    # NOTE: ssao deliberately does NOT darken the GI — the reference uses AO
    # only as a filter/kernel guide, never to modulate lighting
    # (`gi-overview.md:368`); it feeds the ReSTIR spatial radius instead.

    new_state = {"rtdgi_history": out, "rtdgi_hist_len": hist_len}
    # candidates are also returned so RTR can reuse the diffuse rays for
    # rough reflections (rtr.rs:33 reuse_rtdgi_rays)
    return out, new_state, new_restir_state, candidates
