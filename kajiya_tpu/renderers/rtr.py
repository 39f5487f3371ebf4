"""RTR — ray-traced reflections (half-res, VNDF-sampled) with ReSTIR
temporal reservoir reuse, validation, and contact hardening.

Role of `renderers/rtr.rs:90-400` + `assets/shaders/rtr/*`
(doc `gi-overview.md:302-350`): half-res GGX VNDF reflection rays, hit
lighting, ReSTIR-temporal reservoir exchange (`rtr_restir_temporal.hlsl`),
quarter-res validation of stored reservoir rays
(`reflection_validate.rgen.hlsl`), rtdgi candidate-ray reuse at high
roughness (`rtr.rs:33` reuse_rtdgi_rays), BRDF-footprint resolve to full
res, temporal filter, and a ray-length channel consumed for contact
hardening (`rtr.rs:18-73`).

Estimator layout (split-sum): the pipeline outputs the lobe-average of
incoming radiance E_pdf[L]; the deferred combine multiplies the
preintegrated FG energy term (deferred.py). With the ReSTIR target
p_hat = luminance(L) * pdf_vndf_here(wi), the unbiased contribution
radiance * pdf_here * W collapses to (L / lum(L)) * w_sum / M, which for a
single fresh candidate reduces exactly to the plain traced estimate — so
reservoir reuse only ever adds effective samples.

Reservoirs are planar arrays (ops/reservoir.py), exchanged with one wide
packed gather per pass — the TPU-native form of the reference's
RWTexture reservoir ping-pong.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.profiling import pass_scope

from ..brdf import ggx
from ..core import img as im
from ..core import rng as rng_mod
from ..core.color import luminance
from ..ops import reservoir as rsv
from .hit_lighting import hit_radiance
from .reprojection import reproject_planes
from ..rt.trace import scene_trace_closest

RAY_EPS = 1e-4
VALIDATE_PERIOD = 3       # re-check stored rays every 3rd frame (quarter res)
RTDGI_REUSE_ROUGHNESS = 0.55   # above this, rtdgi candidates join the RIS


def init_state(h: int, w: int):
    hh, hw = h // 2, w // 2
    return {
        "rtr_history": jnp.zeros((h, w, 3), jnp.float32),
        "rtr_hist_len": jnp.zeros((h, w), jnp.float32),
        "rtr_ray_len": jnp.zeros((h, w), jnp.float32),
        # half-res reflection reservoirs (rtr_restir_temporal.hlsl state)
        "rtr_res_radiance": jnp.zeros((hh, hw, 3), jnp.float32),
        "rtr_res_dir": jnp.zeros((hh, hw, 3), jnp.float32),
        "rtr_res_t": jnp.zeros((hh, hw), jnp.float32),
        "rtr_res_w_sum": jnp.zeros((hh, hw), jnp.float32),
        "rtr_res_M": jnp.zeros((hh, hw), jnp.float32),
        "rtr_res_W": jnp.zeros((hh, hw), jnp.float32),
        "rtr_res_p_hat": jnp.zeros((hh, hw), jnp.float32),
    }


def reflection_rays(gb, frame_idx):
    """Half-res VNDF reflection ray batch (`reflection.rgen.hlsl`). Returns
    (org, wi, pdf, rng); the frame batches these into the shared secondary
    trace+shade wavefront."""
    pos = im.decimate2(gb["pos"])
    n = im.decimate2(gb["normal"])
    gn = im.decimate2(gb["geo_normal"])
    rough = im.decimate2(gb["roughness"])
    hh, hw = rough.shape
    rd = im.decimate2(gb["ray_dir"])

    px = jnp.arange(hh * hw, dtype=jnp.uint32)
    rng = rng_mod.pixel_rng(px % jnp.uint32(hw), px // jnp.uint32(hw),
                            jnp.uint32(frame_idx), stream=31)
    # blue-noise VNDF sample (reference's rtr blue-noise sampler SSBOs,
    # rtr.rs:18-73): glossy lobes get maximally-spread neighbor samples
    from ..core import bluenoise

    bu1, bu2 = bluenoise.blue_noise_pair(hh, hw, frame_idx, stream=2)
    u1 = bu1.reshape(-1)
    u2 = bu2.reshape(-1)

    nf = n.reshape(-1, 3)
    wo = -rd.reshape(-1, 3)
    wi = ggx.sample_vndf(rough.reshape(-1), nf, wo, u1, u2)
    # reflect below-horizon samples back up
    below = jnp.sum(wi * nf, axis=-1) < 1e-4
    wi = jnp.where(below[:, None],
                   wi - 2.0 * jnp.sum(wi * nf, -1, keepdims=True) * nf, wi)
    wi = wi / jnp.maximum(jnp.linalg.norm(wi, axis=-1, keepdims=True), 1e-12)
    pdf = ggx.pdf_vndf(rough.reshape(-1), nf, wo, wi)

    org = pos.reshape(-1, 3) + gn.reshape(-1, 3) * RAY_EPS * 8
    return org, wi, pdf, rng


def finish_reflections(gb, wi, pdf, hit_t, rad):
    """Assemble the half-res reflection dict from wavefront results."""
    hitm = im.decimate2(gb["hit"])
    hh, hw = hitm.shape
    valid = hitm.reshape(-1)
    return {
        "radiance": jnp.where(valid[:, None], rad, 0.0).reshape(hh, hw, 3),
        "ray_t": jnp.minimum(hit_t, 1e8).reshape(hh, hw),
        "wi": wi.reshape(hh, hw, 3),
        "pdf": pdf.reshape(hh, hw),
        "valid": valid.reshape(hh, hw),
    }


def trace_reflections(ts, gb, frame_idx, sky_env, diffuse_env,
                      prev_lit=None, prev_depth=None, view=None,
                      ircache_lookup=None, max_trace_steps=None,
                      secondary_full_shading: bool = False):
    """Standalone half-res reflection trace (tests / non-batched callers);
    the frame path batches reflection_rays into one shared wavefront."""
    org, wi, pdf, rng = reflection_rays(gb, frame_idx)
    hit = scene_trace_closest(ts, org, wi, t_min=RAY_EPS,
                        max_steps=max_trace_steps)
    rad = hit_radiance(ts, hit, wi, sky_env, diffuse_env,
                       prev_lit=prev_lit, prev_depth=prev_depth, view=view,
                       ircache_lookup=ircache_lookup,
                       max_trace_steps=max_trace_steps, rng=rng,
                       full_shading=secondary_full_shading)
    return finish_reflections(gb, wi, pdf, hit.t, rad)


# ----------------------------------------------------------------------------
# ReSTIR temporal reservoir exchange (rtr_restir_temporal.hlsl)
# ----------------------------------------------------------------------------

def _pack_res(state):
    return {
        "payload": {"radiance": state["rtr_res_radiance"],
                    "dir": state["rtr_res_dir"],
                    "t": state["rtr_res_t"]},
        "w_sum": state["rtr_res_w_sum"],
        "M": state["rtr_res_M"],
        "W": state["rtr_res_W"],
        "p_hat": state["rtr_res_p_hat"],
    }


def _unpack_res(r):
    return {
        "rtr_res_radiance": r["payload"]["radiance"],
        "rtr_res_dir": r["payload"]["dir"],
        "rtr_res_t": r["payload"]["t"],
        "rtr_res_w_sum": r["w_sum"],
        "rtr_res_M": r["M"],
        "rtr_res_W": r["W"],
        "rtr_res_p_hat": r["p_hat"],
    }


def restir_reflections(state, half, gb, reproj, frame_idx,
                       rtdgi_candidates=None):
    """Temporal reservoir resampling for reflections. Returns
    (spec (hh,hw,3) lobe-average radiance, ray_len (hh,hw), new res state).

    Target function: p_hat = lum(L) * pdf_vndf at THIS pixel, so reuse from
    the previous frame is weighted by how compatible the stored direction is
    with the current lobe — mirrors get no cross-lobe bleeding, rough pixels
    reuse freely."""
    hh, hw = half["valid"].shape
    n = im.decimate2(gb["normal"]).reshape(-1, 3)
    wo = -im.decimate2(gb["ray_dir"]).reshape(-1, 3)
    rough_h = im.decimate2(gb["roughness"])
    rough = rough_h.reshape(-1)

    px = jnp.arange(hh * hw, dtype=jnp.uint32).reshape(hh, hw)
    rng = rng_mod.pixel_rng(px % jnp.uint32(hw), px // jnp.uint32(hw),
                            jnp.uint32(frame_idx), stream=37)

    def p_hat_of(radiance, direction):
        lum = luminance(radiance.reshape(-1, 3))
        pdf_here = ggx.pdf_vndf(rough, n, wo, direction.reshape(-1, 3))
        cos_ok = jnp.sum(direction.reshape(-1, 3) * n, axis=-1) > 0.0
        return jnp.where(cos_ok, lum * pdf_here, 0.0).reshape(hh, hw)

    # ---- fresh candidate (M=1): w = p_hat / pdf_vndf = lum(L)
    cand_payload = {"radiance": half["radiance"], "dir": half["wi"],
                    "t": half["ray_t"]}
    p_hat_c = p_hat_of(half["radiance"], half["wi"])
    w_c = p_hat_c / jnp.maximum(half["pdf"], 1e-12)
    cur = rsv.init((hh, hw), cand_payload)
    u, rng = rng_mod.rand_u01(rng)
    cur = rsv.update(cur, cand_payload, w_c.reshape(hh, hw), p_hat_c, u,
                     mask=half["valid"])

    # ---- rtdgi candidate reuse at high roughness (rtr.rs:33): the diffuse
    # candidate ray doubles as a second specular candidate for rough lobes,
    # at zero extra rays. Source pdf = cosine hemisphere.
    if rtdgi_candidates is not None:
        gi_dir = rtdgi_candidates["ray_dir"]
        gi_rad = rtdgi_candidates["radiance"]
        gi_t = rtdgi_candidates["ray_t"]
        cosg = jnp.maximum(jnp.sum(gi_dir.reshape(-1, 3) * n, -1), 0.0)
        pdf_cos = jnp.maximum(cosg / jnp.pi, 1e-12)
        p_hat_g = p_hat_of(gi_rad, gi_dir)
        w_g = (p_hat_g.reshape(-1) / pdf_cos).reshape(hh, hw)
        ok = (half["valid"] & rtdgi_candidates["valid"]
              & (rough_h > RTDGI_REUSE_ROUGHNESS))
        u, rng = rng_mod.rand_u01(rng)
        cur = rsv.update(
            cur, {"radiance": gi_rad, "dir": gi_dir, "t": gi_t},
            w_g, p_hat_g, u, mask=ok)

    # ---- temporal merge with the reprojected previous reservoir
    prev = _pack_res(state)
    packed_prev = jnp.concatenate([
        prev["payload"]["radiance"], prev["payload"]["dir"],
        prev["payload"]["t"][..., None], prev["w_sum"][..., None],
        prev["M"][..., None], prev["W"][..., None],
        prev["p_hat"][..., None]], axis=-1)
    f = im.warp_nearest(packed_prev, im.decimate2(reproj["prev_uv"]))
    prev_f = {
        "payload": {"radiance": f[..., 0:3], "dir": f[..., 3:6],
                    "t": f[..., 6]},
        "w_sum": f[..., 7], "M": f[..., 8], "W": f[..., 9],
        "p_hat": f[..., 10],
    }
    # roughness-scaled M clamp: mirrors keep little history (reflections
    # change under parallax), rough lobes accumulate up to ~12 samples
    m_clamp = 1.0 + rough_h * 11.0
    prev_f = rsv.clamp_m(prev_f, m_clamp)
    p_hat_t = p_hat_of(prev_f["payload"]["radiance"], prev_f["payload"]["dir"])
    validity = im.decimate2(reproj["validity"])
    u, rng = rng_mod.rand_u01(rng)
    cur = rsv.merge(cur, prev_f, p_hat_t, u,
                    mask=(validity > 0.5) & half["valid"])

    # ---- unbiased lobe-average estimate:
    # E[L] ~= L * pdf_here * W  ==  (L / lum(L)) * w_sum / M
    sel_rad = cur["payload"]["radiance"]
    sel_phat = p_hat_of(sel_rad, cur["payload"]["dir"])
    est = sel_rad * (sel_phat * cur["W"])[..., None] / jnp.maximum(
        luminance(sel_rad), 1e-8)[..., None]
    # guard: reservoirs that never saw a sample fall back to the fresh trace
    est = jnp.where((cur["M"] > 0.0)[..., None], est, half["radiance"])
    ray_len = jnp.where(cur["M"] > 0.0, cur["payload"]["t"], half["ray_t"])
    return est, ray_len, _unpack_res(cur)


def validation_rays(state, gb):
    """Ray batch for the quarter-res reflection reservoir re-trace
    (`reflection_validate.rgen.hlsl`). Returns (org, d, ctx); the frame
    batches these into the shared secondary trace+shade wavefront."""
    pos_q = im.decimate2(im.decimate2(gb["pos"]))
    gn_q = im.decimate2(im.decimate2(gb["geo_normal"]))
    dir_q = im.decimate2(state["rtr_res_dir"])
    rad_q = im.decimate2(state["rtr_res_radiance"])

    d = dir_q.reshape(-1, 3)
    live = jnp.linalg.norm(d, axis=-1) > 0.5
    d = jnp.where(live[:, None], d, jnp.array([0.0, 1.0, 0.0]))
    org = pos_q.reshape(-1, 3) + gn_q.reshape(-1, 3) * RAY_EPS * 8
    ctx = {"qh": dir_q.shape[0], "qw": dir_q.shape[1], "live": live,
           "rad_q": rad_q}
    return org, d, ctx


def apply_validation(state, ctx, hit_t, fresh):
    """Second half of the reflection validation: where the fresh radiance
    disagrees with the stored one, the stored sample is replaced and its
    history cut, so stale reflections (moved lights/objects) die within one
    validation period (`gi-overview.md:346-350`)."""
    hh, hw = state["rtr_res_t"].shape
    qh, qw = ctx["qh"], ctx["qw"]
    live, rad_q = ctx["live"], ctx["rad_q"]
    lum_old = luminance(rad_q.reshape(-1, 3))
    lum_new = luminance(fresh)
    mismatch = (jnp.abs(lum_new - lum_old)
                > 0.3 * jnp.maximum(jnp.maximum(lum_old, lum_new), 1e-3))
    invalid = (mismatch & live).reshape(qh, qw)

    # Scatter back to half res. Only the top-left reservoir of each 2x2 was
    # actually re-traced (along ITS stored dir), so only that lane gets the
    # fresh payload; the 3 neighbors keep their own dir/radiance but have
    # their history cut (M clamp) so their stale sample re-weighs fast.
    inv_h = jnp.repeat(jnp.repeat(invalid, 2, axis=0), 2, axis=1)[:hh, :hw]
    fresh_h = jnp.repeat(jnp.repeat(fresh.reshape(qh, qw, 3), 2, axis=0),
                         2, axis=1)[:hh, :hw]
    t_h = jnp.repeat(jnp.repeat(
        jnp.minimum(hit_t, 1e8).reshape(qh, qw), 2, axis=0),
        2, axis=1)[:hh, :hw]
    rows = jnp.arange(hh)[:, None]
    cols = jnp.arange(hw)[None, :]
    traced_lane = (rows % 2 == 0) & (cols % 2 == 0)
    replace = inv_h & traced_lane
    cut_only = inv_h & ~traced_lane

    # p_hat = lum(L) * pdf_vndf(dir): dir is unchanged on the re-traced
    # lane, so the new p_hat is the old one rescaled by the luminance ratio
    lum_old_h = luminance(state["rtr_res_radiance"].reshape(-1, 3)
                          ).reshape(hh, hw)
    lum_new_h = luminance(fresh_h.reshape(-1, 3)).reshape(hh, hw)
    p_hat_new = jnp.where(lum_old_h > 1e-8,
                          state["rtr_res_p_hat"] * lum_new_h
                          / jnp.maximum(lum_old_h, 1e-8),
                          lum_new_h)

    new = dict(state)
    new["rtr_res_radiance"] = jnp.where(replace[..., None], fresh_h,
                                        state["rtr_res_radiance"])
    new["rtr_res_t"] = jnp.where(replace, t_h, state["rtr_res_t"])
    new["rtr_res_p_hat"] = jnp.where(replace, p_hat_new,
                                     state["rtr_res_p_hat"])
    # replaced sample restarts with M=1, w_sum=lum so the single-sample
    # estimate (L/lum)*w_sum/M equals the fresh trace; W kept consistent
    # with w_sum/(M*p_hat)
    w_sum_r = lum_new_h
    new["rtr_res_w_sum"] = jnp.where(replace, w_sum_r,
                                     state["rtr_res_w_sum"])
    new["rtr_res_W"] = jnp.where(
        replace, w_sum_r / jnp.maximum(p_hat_new, 1e-8),
        state["rtr_res_W"])
    new["rtr_res_M"] = jnp.where(replace, 1.0, state["rtr_res_M"])
    # neighbors: proportional M clamp (W = w_sum/(M*p_hat) invariant)
    m_old = new["rtr_res_M"]
    factor = jnp.where(cut_only & (m_old > 1.0),
                       1.0 / jnp.maximum(m_old, 1.0), 1.0)
    new["rtr_res_M"] = m_old * factor
    new["rtr_res_w_sum"] = new["rtr_res_w_sum"] * factor
    return new


def validate_reservoirs(ts, state, gb, sky_env, diffuse_env, frame_idx,
                        prev_lit=None, prev_depth=None, view=None,
                        ircache_lookup=None, max_trace_steps=None,
                        secondary_full_shading: bool = False):
    """Standalone reservoir validation (tests / non-batched callers):
    validation_rays -> trace -> shade -> apply_validation. The frame path
    batches the rays into its shared secondary wavefront."""
    org, d, ctx = validation_rays(state, gb)
    hit = scene_trace_closest(ts, org, d, t_min=RAY_EPS,
                              max_steps=max_trace_steps)
    fresh = hit_radiance(ts, hit, d, sky_env, diffuse_env,
                         prev_lit=prev_lit, prev_depth=prev_depth, view=view,
                         ircache_lookup=ircache_lookup,
                         max_trace_steps=max_trace_steps,
                         full_shading=secondary_full_shading)
    return apply_validation(state, ctx, hit.t, fresh)


def _resolve_footprint(res_planes, spec_h, ray_len_h, gb, view,
                       near: float = 0.01):
    """Full-res BRDF-lobe footprint resolve — the reference's
    `rtr/resolve.hlsl` estimator (8-sample spiral, radius scaled to the
    projected lobe footprint, each sample re-weighted by the center BRDF;
    host table `rtr.rs:402+` SPATIAL_RESOLVE_OFFSETS).

    TPU-native form: the data-dependent spiral gather becomes a STATIC tap
    lattice in half-res space (center + r=1 ring + r~2.8 ring = 13 pure
    slice-shifts shared by all four output phases), and the footprint
    dependence moves into per-pixel gaussian RING WEIGHTS — taps as static
    shifts per roughness bin instead of an offset table. Each tap is
    re-weighted exactly like `contrib_accum` in resolve.hlsl:
      w = ring(sigma_px) * pdf_vndf_center(dir to neighbor's stored hit)
          * W_neighbor * measure_conversion
    with the reference's rejections (neighbor much rougher than center,
    empty reservoirs) and its kernel-size law
    sigma ~ sqrt(roughness)/4 * ray_len/(ray_len+eye_dist) (resolve.hlsl's
    tan_theta / kernel_size_ws derivation, incl. the contact-sharpening
    smoothstep clamp). Anisotropy (kernel_t1/t2 elongation) is the one
    piece static shifts cannot express; documented deviation.

    res_planes: dict with rtr_res_{radiance,dir,t,W,M} half-res planes (the
    post-merge reservoirs). spec_h: center fallback estimate for lanes
    whose neighborhood is empty. Returns (spec (H,W,3), ray_len (H,W))."""
    import math

    hh, hw = ray_len_h.shape
    h, w = gb["depth"].shape

    # ---- packed half-res neighbor plane (one shift per tap moves all 10
    # channels): radiance(3), stored hit point(3), t(1), W(1), vz(1),
    # roughness(1)
    pos_h = im.decimate2(gb["pos"])
    vz_h = im.decimate2(near / jnp.maximum(gb["depth"], 1e-12))
    rough_h = im.decimate2(gb["roughness"])
    rad_nb = res_planes["rtr_res_radiance"]
    t_nb = res_planes["rtr_res_t"]
    hit_nb = pos_h + res_planes["rtr_res_dir"] * t_nb[..., None]
    w_nb = jnp.where(res_planes["rtr_res_M"] > 0.0,
                     res_planes["rtr_res_W"], 0.0)
    packed = jnp.concatenate([
        rad_nb, hit_nb, t_nb[..., None], w_nb[..., None],
        vz_h[..., None], rough_h[..., None]], axis=-1)

    # tap lattice (half-res offsets) — shifted ONCE, reused by all phases
    offsets = [(0, 0),
               (0, 1), (0, -1), (1, 0), (-1, 0),
               (1, 1), (1, -1), (-1, 1), (-1, -1),
               (2, 2), (2, -2), (-2, 2), (-2, -2)]
    radii = [math.hypot(dy, dx) for dy, dx in offsets]
    taps = im.shift_stack(packed, offsets)      # (13, hh, hw, 10)

    # ---- center planes per output phase (one packed split: 11 channels)
    center = jnp.concatenate([
        gb["normal"], gb["roughness"][..., None], gb["ray_dir"],
        gb["pos"], near / jnp.maximum(gb["depth"], 1e-12)[..., None],
        gb["hit"][..., None].astype(jnp.float32)], axis=-1)
    center_ph = im.phase_split(center)

    v2c11 = view.view_to_clip[1, 1]             # 1 / tan(fov_y / 2)
    out_v = [[None, None], [None, None]]
    out_t = [[None, None], [None, None]]
    for py in (0, 1):
        for px in (0, 1):
            c = center_ph[py][px]
            n_c, rough_c = c[..., 0:3], c[..., 3]
            wo_c = -c[..., 4:7]
            pos_c, vz_c, hit_c = c[..., 7:10], c[..., 10], c[..., 11]
            d_c = jnp.sqrt(jnp.maximum(jnp.sum(
                (pos_c - view.eye_position) ** 2, -1), 1e-8))

            # footprint sigma in HALF-res pixels (resolve.hlsl kernel law,
            # contact-sharpening clamp included)
            rl = ray_len_h
            cl = jnp.maximum(
                rl, 0.2 * d_c * _sstep(0.0, 0.05 * d_c, rl))
            tan_theta = jnp.sqrt(jnp.maximum(rough_c, 1e-4)) * 0.25
            sigma = 0.25 * hh * tan_theta * v2c11 * cl / (cl + d_c)
            sigma = jnp.clip(sigma, 0.7, 5.0)
            inv2s2 = 1.0 / (2.0 * sigma * sigma)

            acc = jnp.zeros((hh, hw, 3), jnp.float32)
            wacc = jnp.zeros((hh, hw), jnp.float32)
            tacc = jnp.zeros((hh, hw), jnp.float32)
            for k, (r_k, (dy, dx)) in enumerate(zip(radii, offsets)):
                nb = taps[k]
                rad_k, hit_k = nb[..., 0:3], nb[..., 3:6]
                t_k, w_k = nb[..., 6], nb[..., 7]
                vz_k, rough_k = nb[..., 8], nb[..., 9]
                dvec = hit_k - pos_c
                c2h = jnp.sqrt(jnp.maximum(jnp.sum(dvec * dvec, -1), 1e-12))
                wi = dvec / c2h[..., None]
                pdf_c = ggx.pdf_vndf(rough_c, n_c, wo_c, wi)
                # measure conversion, clamped >= the reference's
                # RTR_MEASURE_CONVERSION_CLAMP_ATTENUATION=1 convention
                conv = jnp.minimum((t_k / c2h) ** 2, 1.0)
                ok = ((w_k > 0.0)
                      & (rough_k <= rough_c * 2.0 + 1e-3)
                      & (jnp.abs(vz_k - vz_c) < 0.15 * vz_c + 1e-4)
                      & (jnp.sum(wi * n_c, -1) > 0.0))
                wt = (jnp.exp(-(r_k * r_k) * inv2s2) * pdf_c * w_k * conv
                      * ok.astype(jnp.float32))
                acc = acc + rad_k * wt[..., None]
                wacc = wacc + wt
                tacc = tacc + t_k * wt
            lo = wacc > 1e-10
            out = jnp.where(lo[..., None], acc / jnp.maximum(
                wacc, 1e-10)[..., None], spec_h)
            out_v[py][px] = jnp.where(hit_c[..., None] > 0.5, out, 0.0)
            out_t[py][px] = jnp.where(
                lo, tacc / jnp.maximum(wacc, 1e-10), ray_len_h)
    return im.weave2x2(out_v), im.weave2x2(out_t)


def _sstep(lo, hi, x):
    t = jnp.clip((x - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _resolve_full(spec_h, ray_len_h, gb, near: float = 0.01):
    """Half->full joint-bilateral resolve, roughness-aware (role of
    `rtr/resolve.hlsl`'s BRDF-footprint gather). Contact hardening: taps
    whose hit distance is much shorter than the neighborhood's tighten the
    kernel (short rays = sharp contact reflections; the reference drives
    this off its ray-len texture).

    PHASE-MAJOR like restir_gi.resolve: each output phase is computed at
    half res from static +-1 shifts with constant bilinear weights, then
    the finished planes are woven once (one relayout instead of 4 per tap
    per input plane)."""
    vz_ph = im.phase_split(near / jnp.maximum(gb["depth"], 1e-12))
    n_ph = im.phase_split(gb["normal"])
    vz_h = vz_ph[0][0]
    n_h = n_ph[0][0]

    # 8-channel packed half-res plane: the 4 bilinear taps of each phase
    # ride one stacked axis -> tap math traced once per phase, not per tap
    packed_h = jnp.concatenate([vz_h[..., None], n_h, ray_len_h[..., None],
                                spec_h], axis=-1)
    out_v = [[None, None], [None, None]]
    out_t = [[None, None], [None, None]]
    for py in (0, 1):
        for px in (0, 1):
            vz = vz_ph[py][px]
            nf = n_ph[py][px]
            # tap (ky=py, kx=px) lands at shift (0, 0) = the center tap
            t_center = ray_len_h
            offs = [(ky - 1 + py, kx - 1 + px) for ky in (0, 1)
                    for kx in (0, 1)]
            bw = jnp.asarray([(0.75 if ky != py else 0.25)
                              * (0.75 if kx != px else 0.25)
                              for ky in (0, 1) for kx in (0, 1)],
                             jnp.float32)[:, None, None]
            s = im.shift_stack(packed_h, offs)        # (4, hh, hw, 8)
            zz, nn = s[..., 0], s[..., 1:4]
            t, v = s[..., 4], s[..., 5:8]
            w_z = jnp.exp(-jnp.abs(zz - vz) / (0.05 * vz + 1e-4))
            w_n = jnp.maximum(jnp.sum(nn * nf, axis=-1), 0.0) ** 16
            # contact hardening: a tap with a much longer hit distance than
            # the nearest must not blur into the contact region
            w_t = 1.0 / (1.0 + 2.0 * jnp.abs(t - t_center)
                         / (jnp.minimum(t, t_center) + 1e-3))
            wt = bw * w_z * w_n * w_t + 1e-6
            accw = jnp.sum(wt, axis=0)
            out_v[py][px] = jnp.sum(v * wt[..., None], axis=0) / accw[..., None]
            out_t[py][px] = jnp.sum(t * wt, axis=0) / accw
    return im.weave2x2(out_v), im.weave2x2(out_t)


def rtr_pipeline(ts, gb, view, frame_idx, state, reproj, sky_env, diffuse_env,
                 prev_lit=None, prev_depth=None, ircache_lookup=None,
                 max_trace_steps=None, half=None, mesh_light_specular=False,
                 rtdgi_candidates=None, use_restir: bool = True,
                 secondary_full_shading: bool = False,
                 validated: bool = False):
    """Full chain -> (specular radiance (H, W, 3), new_state).

    half: precomputed by the frame's shared secondary-ray wavefront (one
    trace+shade for all GI passes); traced here standalone when absent.
    `validated` marks the reservoir state as already validated by the
    frame's batched validation pass."""
    if half is None:
        half = trace_reflections(
            ts, gb, frame_idx, sky_env, diffuse_env, prev_lit=prev_lit,
            prev_depth=prev_depth, view=view, ircache_lookup=ircache_lookup,
            max_trace_steps=max_trace_steps,
            secondary_full_shading=secondary_full_shading)

    if mesh_light_specular:
        # explicit emissive-triangle specular added into the reflection
        # stream pre-filtering (world_render_passes.rs:192-203)
        from .lighting import sample_lights_specular

        half = dict(half)
        half["radiance"] = half["radiance"] + sample_lights_specular(
            ts, gb, frame_idx, max_trace_steps=max_trace_steps)

    res_keys = [k for k in state if k.startswith("rtr_res_")]
    if use_restir and res_keys:
        # validation runs every VALIDATE_PERIOD frames, before the exchange
        res_state = {k: state[k] for k in res_keys}

        if not validated:
            def do_validate(rs):
                return validate_reservoirs(
                    ts, rs, gb, sky_env, diffuse_env, frame_idx,
                    prev_lit=prev_lit, prev_depth=prev_depth, view=view,
                    ircache_lookup=ircache_lookup,
                    max_trace_steps=max_trace_steps,
                    secondary_full_shading=secondary_full_shading)

            res_state = jax.lax.cond(
                jnp.asarray(frame_idx, jnp.int32) % VALIDATE_PERIOD == 0,
                do_validate, lambda rs: rs, res_state)
        with pass_scope("restir"):
            spec_h, ray_len_h, res_state = restir_reflections(
                res_state, half, gb, reproj, frame_idx,
                rtdgi_candidates=rtdgi_candidates)
    else:
        spec_h, ray_len_h = half["radiance"], half["ray_t"]
        res_state = {k: state[k] for k in res_keys}

    if use_restir and res_keys:
        res_planes = res_state
    else:
        # pseudo-reservoir from the fresh trace: W = 1/pdf makes the
        # footprint estimator collapse to plain MIS-weighted averaging
        res_planes = {
            "rtr_res_radiance": half["radiance"],
            "rtr_res_dir": half["wi"],
            "rtr_res_t": half["ray_t"],
            "rtr_res_W": 1.0 / jnp.maximum(half["pdf"], 1e-8),
            "rtr_res_M": half["valid"].astype(jnp.float32),
        }
    with pass_scope("resolve"):
        full, ray_len = _resolve_footprint(res_planes, spec_h, ray_len_h,
                                           gb, view)

    # temporal: rougher surfaces tolerate longer history; mirrors converge
    # fast anyway (temporal_filter.hlsl + spatial_cleanup.hlsl roles).
    # Contact regions (short rays) shorten history too: they move with
    # parallax far faster than distant reflections.
    with pass_scope("temporal"):
        fetched = reproject_planes(
            {"h": state["rtr_history"], "l": state["rtr_hist_len"]}, reproj)
    hist = fetched["h"]
    hist_len = fetched["l"]
    contact = jnp.clip(ray_len / (near_len := 0.2), 0.0, 1.0)
    max_len = (4.0 + gb["roughness"] * 24.0) * (0.35 + 0.65 * contact)
    del near_len
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
        **res_state,
    }
    return out, new_state
