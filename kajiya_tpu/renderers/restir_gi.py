"""ReSTIR GI: reservoir-resampled diffuse final gather (half-res).

Role of the reference's restir chain in `renderers/rtdgi.rs:364-554`
(`restir_temporal.hlsl`, `restir_spatial.hlsl` x2, `restir_resolve.hlsl`;
doc `gi-overview.md:99-161`): candidate rays feed per-pixel reservoirs that
are resampled temporally (reprojected history) and spatially (jittered
neighbor taps with geometry similarity), multiplying the effective sample
count at ~1 traced ray per half-res pixel.

TPU re-design: reservoirs are planar arrays (ops/reservoir.py). The payload
is the RECONNECTION data — radiance + world-space hit point + hit normal —
and every reuse re-derives the direction from the receiving surface with
the solid-angle jacobian (cos_hit ratio x distance^2 ratio), exactly the
`restir_spatial.hlsl` shift map. Reusing raw directions instead is NOT a
valid shortcut: at interior scales the spatial kernel spans a large
parallax, and the missing jacobian compounds through the temporal feedback
into a 30-40% energy loss (measured on the cornell box). Target function
p_hat = luminance(L) * max(n . dir, 0); cosine-sampled candidates enter
with the constant RIS weight pi * luminance(L). Spatial taps are static
jittered offsets -> coalesced tile-shift DMAs instead of warp-divergent
loops.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import img as im
from ..core import rng as rng_mod
from ..core.color import luminance
from ..ops import reservoir as rsv

M_CLAMP_TEMPORAL = 20.0
M_CLAMP_SPATIAL = 4.0
JACOBIAN_CLAMP = 8.0        # firefly guard on the reconnection jacobian


def init_state(h: int, w: int):
    hh, hw = h // 2, w // 2
    payload = {
        "radiance": jnp.zeros((hh, hw, 3), jnp.float32),
        "hit": jnp.zeros((hh, hw, 3), jnp.float32),    # world hit point
        "hitn": jnp.zeros((hh, hw, 3), jnp.float32),   # hit-surface normal
    }
    r = rsv.init((hh, hw), payload)
    return {
        "gi_res_payload_radiance": r["payload"]["radiance"],
        "gi_res_payload_hit": r["payload"]["hit"],
        "gi_res_payload_hitn": r["payload"]["hitn"],
        "gi_res_w_sum": r["w_sum"],
        "gi_res_M": r["M"],
        "gi_res_W": r["W"],
        "gi_res_p_hat": r["p_hat"],
    }


def _pack(state):
    return {
        "payload": {
            "radiance": state["gi_res_payload_radiance"],
            "hit": state["gi_res_payload_hit"],
            "hitn": state["gi_res_payload_hitn"],
        },
        "w_sum": state["gi_res_w_sum"],
        "M": state["gi_res_M"],
        "W": state["gi_res_W"],
        "p_hat": state["gi_res_p_hat"],
    }


def _unpack(r):
    return {
        "gi_res_payload_radiance": r["payload"]["radiance"],
        "gi_res_payload_hit": r["payload"]["hit"],
        "gi_res_payload_hitn": r["payload"]["hitn"],
        "gi_res_w_sum": r["w_sum"],
        "gi_res_M": r["M"],
        "gi_res_W": r["W"],
        "gi_res_p_hat": r["p_hat"],
    }


def _reconnect(hit, pos):
    """Direction + distance from a surface point to a stored hit point."""
    d = hit - pos
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12))
    return d / dist[..., None], dist


def _jacobian(hit, hitn, pos_owner, pos_receiver):
    """Solid-angle density ratio for reusing the owner's hit sample from the
    receiver's surface point (`restir_spatial.hlsl` jacobian): the cosine at
    the hit surface changes and so does the squared distance. Clamped to
    kill fireflies from grazing reconnections."""
    dir_a, da = _reconnect(hit, pos_owner)
    dir_b, db = _reconnect(hit, pos_receiver)
    ca = jnp.maximum(jnp.sum(hitn * (-dir_a), axis=-1), 1e-4)
    cb = jnp.maximum(jnp.sum(hitn * (-dir_b), axis=-1), 0.0)
    j = (cb / ca) * (da * da) / jnp.maximum(db * db, 1e-8)
    return jnp.clip(j, 0.0, JACOBIAN_CLAMP)


def _p_hat_at(payload, pos, normal):
    """Target function at a receiving surface: re-derived direction."""
    direction, _ = _reconnect(payload["hit"], pos)
    return luminance(payload["radiance"]) * jnp.maximum(
        jnp.sum(direction * normal, axis=-1), 0.0)


def _occluded(pos, hit, vz_h, view, near, samples, max_px: float = 8.0):
    """Screen-space occlusion raymarch along the receiver->hit segment
    (`restir_spatial.hlsl` occlusion_raymarch): depth-test a few interior
    points against the half-res z buffer; a surface in front of the segment
    (within a relative thickness window, so distant foreground objects do
    not false-positive) marks the reused sample occluded.

    TPU shape: the march is CLAMPED to `max_px` screen pixels from the
    receiver. The occluders that matter are local (the sample came from a
    <=12 px spatial kernel), and the bound makes every depth fetch satisfy
    the Pallas warp kernel's locality contract — `samples` MXU passes
    instead of XLA serial gathers (~6x cheaper at 1080p)."""
    from .hit_lighting import _project_to_uv

    hh, hw = vz_h.shape
    uv0 = im.pixel_uv(hh, hw)
    z0 = vz_h
    uv1, inb1 = _project_to_uv(view.world_to_clip, hit)
    wv = view.world_to_view
    z1 = -(wv[2, 0] * hit[..., 0] + wv[2, 1] * hit[..., 1]
           + wv[2, 2] * hit[..., 2] + wv[2, 3])
    delta = uv1 - uv0
    px_len = jnp.sqrt((delta[..., 0] * hw) ** 2 + (delta[..., 1] * hh) ** 2)
    scale = jnp.minimum(1.0, max_px / jnp.maximum(px_len, 1e-6))

    occ = jnp.zeros((hh, hw), bool)
    for i in range(samples):
        s = (i + 1.0) / (samples + 1.0)
        uv = uv0 + delta * (scale * s)[..., None]
        # view-z approximately linear along the clamped screen segment
        z_e = z0 + (z1 - z0) * scale * s
        # max_px=8 bounds the fetch: 16-row tile + 2*8 px offsets + 7
        # align rows fit a 40-row window (17% less DMA amplification
        # than the default 48; the window is this warp's entire cost)
        z_s = im.warp_nearest(vz_h[..., None], jnp.clip(uv, 0.0, 1.0),
                              window_rows=40)[..., 0]
        rel = (z_e - z_s) / jnp.maximum(z_s, 1e-4)
        occ = occ | (inb1 & (rel > 0.05) & (rel < 0.6))
    return occ


def _geo_weight(vz, vz_n, n, n_n):
    w_z = (jnp.abs(vz - vz_n) / (0.1 * vz + 1e-4)) < 1.0
    w_n = jnp.sum(n * n_n, axis=-1) > 0.7
    return w_z & w_n


def restir_diffuse(state, candidates, gb_h, reproj, frame_idx,
                   ssao_h=None, near: float = 0.01, view=None,
                   occlusion_samples: int = 2):
    """Temporal + 2 spatial reservoir passes at half res.

    candidates: dict from rtdgi.trace_candidates. Returns (reservoir dict
    for resolve, new flat state).

    view + occlusion_samples > 0 enable the final spatial pass's
    screen-space occlusion raymarch (`restir_spatial.hlsl`'s
    `occlusion_raymarch`): sample points along the receiver->hit segment
    are depth-tested against the half-res z buffer and occluded taps are
    rejected, cutting the light leaks that bare reservoir reuse lets
    through walls."""
    hh, hw = gb_h["hit"].shape
    n = gb_h["normal"]
    pos = gb_h["pos"]
    vz = near / jnp.maximum(gb_h["depth"], 1e-12)

    px = jnp.arange(hh * hw, dtype=jnp.uint32).reshape(hh, hw)
    rng = rng_mod.pixel_rng(px % jnp.uint32(hw), px // jnp.uint32(hw),
                            jnp.uint32(frame_idx), stream=41)

    from ..core.profiling import pass_scope

    # ---- candidate reservoir (M=1)
    cand_payload = {"radiance": candidates["radiance"],
                    "hit": candidates["hit_pos"],
                    "hitn": candidates["hit_normal"]}
    lum = luminance(candidates["radiance"])
    cosg = jnp.maximum(jnp.sum(candidates["ray_dir"] * n, axis=-1), 0.0)
    p_hat_c = lum * cosg
    w_c = jnp.pi * lum                        # p_hat / (cos/pi)
    cur = rsv.init((hh, hw), cand_payload)
    u, rng = rng_mod.rand_u01(rng)
    cur = rsv.update(cur, cand_payload, w_c, p_hat_c, u,
                     mask=candidates["valid"])

    # ---- temporal: reprojected previous reservoir (restir_temporal.hlsl).
    # The reprojected lane names ~the same surface point, so the jacobian is
    # ~1; the direction is still re-derived from the CURRENT surface.
    prev = _pack(state)
    prev_uv = im.decimate2(reproj["prev_uv"])
    validity = im.decimate2(reproj["validity"])

    packed_prev = jnp.concatenate([
        prev["payload"]["radiance"], prev["payload"]["hit"],
        prev["payload"]["hitn"], prev["w_sum"][..., None],
        prev["M"][..., None], prev["W"][..., None],
        prev["p_hat"][..., None]], axis=-1)
    f = im.warp_nearest(packed_prev, prev_uv)
    prev_f = {
        "payload": {"radiance": f[..., 0:3], "hit": f[..., 3:6],
                    "hitn": f[..., 6:9]},
        "w_sum": f[..., 9], "M": f[..., 10], "W": f[..., 11],
        "p_hat": f[..., 12],
    }
    prev_f = rsv.clamp_m(prev_f, M_CLAMP_TEMPORAL)
    p_hat_t = _p_hat_at(prev_f["payload"], pos, n)
    u, rng = rng_mod.rand_u01(rng)
    cur = rsv.merge(cur, prev_f, p_hat_t, u,
                    mask=(validity > 0.5) & candidates["valid"])

    # the POST-TEMPORAL reservoir is what persists to the next frame (the
    # reference's temporal ping-pong is written here, before the spatial
    # passes — `rtdgi.rs:364-476`). Feeding the post-spatial result back
    # instead lets samples random-walk across the screen over frames
    # (M grows ~500 and reused jacobian chains redistribute energy
    # spatially; measured on the near-field harness in
    # tools/dbg_restir_energy.py).
    next_state = _unpack(cur)

    # ---- spatial x2 (restir_spatial.hlsl): golden-angle spiral taps with
    # the rotation quantized to (8, 128) hardware tiles. The reference
    # already quantizes its spiral rotation to 8x8 pixel blocks for cache
    # coherence (restir_spatial.hlsl:108-119); quantizing to the VMEM tile
    # turns every tap into a pure-DMA tile_shift (ops/tileshift_pallas.py)
    # instead of a per-pixel gather/warp — ~6x cheaper per tap. All
    # reservoir planes + geometry guides are PACKED into one wide array so
    # each tap moves 21 channels in one kernel pass. Sample counts match
    # restir_spatial.hlsl:75-76 (8 incl. center, then 5 incl. center).
    from ..ops import tileshift_pallas as tsp

    def pack(res):
        return jnp.concatenate([
            res["payload"]["radiance"], res["payload"]["hit"],
            res["payload"]["hitn"], res["w_sum"][..., None],
            res["M"][..., None], res["W"][..., None],
            res["p_hat"][..., None], n, vz[..., None], pos], axis=-1)

    def unpack(p):
        return ({"payload": {"radiance": p[..., 0:3], "hit": p[..., 3:6],
                             "hitn": p[..., 6:9]},
                 "w_sum": p[..., 9], "M": p[..., 10], "W": p[..., 11],
                 "p_hat": p[..., 12]},
                p[..., 13:16], p[..., 16], p[..., 17:20])  # n_nb, vz_nb, pos_nb

    GOLDEN_ANGLE = 2.39996323
    nty, ntx = tsp.tile_grid(hh, hw)
    trow = jnp.arange(nty * ntx, dtype=jnp.uint32)

    # reservoir dict <-> one (hh, hw, 13) carry plane for lax.scan
    def res13(res):
        return jnp.concatenate([
            res["payload"]["radiance"], res["payload"]["hit"],
            res["payload"]["hitn"], res["w_sum"][..., None],
            res["M"][..., None], res["W"][..., None],
            res["p_hat"][..., None]], axis=-1)

    def unres13(p):
        return {"payload": {"radiance": p[..., 0:3], "hit": p[..., 3:6],
                            "hitn": p[..., 6:9]},
                "w_sum": p[..., 9], "M": p[..., 10], "W": p[..., 11],
                "p_hat": p[..., 12]}

    # The taps of each pass run as a lax.scan — the tap body (tile-shift
    # fetch, geometry gate, occlusion raymarch, jacobian, reservoir merge)
    # is traced ONCE per pass instead of once per tap (compile-size diet,
    # round 4; ~11 unrolled bodies -> 2).
    for pass_idx, (radius, n_taps) in enumerate(((12.0, 7), (6.0, 4))):
      with pass_scope(f"spatial{pass_idx}"):
        packed = pack(cur)
        t_rng = rng_mod.pixel_rng(trow % jnp.uint32(ntx),
                                  trow // jnp.uint32(ntx),
                                  jnp.uint32(frame_idx), stream=47 + pass_idx)
        u_ang, t_rng = rng_mod.rand_u01(t_rng)            # (nt,) per-tile
        ks = jnp.arange(1, n_taps + 1, dtype=jnp.float32)
        ang = (ks[:, None] + u_ang[None, :]) * GOLDEN_ANGLE
        r = jnp.sqrt(ks / n_taps)[:, None] * radius
        dy_s = jnp.round(jnp.sin(ang) * r).astype(jnp.int32)  # (n_taps, nt)
        dx_s = jnp.round(jnp.cos(ang) * r).astype(jnp.int32)
        us = []
        for _ in range(n_taps):
            u, rng = rng_mod.rand_u01(rng)
            us.append(u)
        u_s = jnp.stack(us)                               # (n_taps, hh, hw)
        do_occl = (pass_idx == 1 and view is not None
                   and occlusion_samples > 0)

        def tap_body(carry, xs, _do_occl=do_occl, _packed=packed):
            dy, dx, u = xs
            merged = unres13(carry)
            nb, n_nb, vz_nb, pos_nb = unpack(tsp.tile_shift(_packed, dy, dx))
            ok = _geo_weight(vz, vz_nb, n, n_nb) & candidates["valid"]
            if _do_occl:
                ok = ok & ~_occluded(pos, nb["payload"]["hit"], vz, view,
                                     near, occlusion_samples)
            # reconnection: the neighbor's hit sample evaluated FROM our
            # surface — direction re-derived, density moved by the jacobian
            p_hat_nb = _p_hat_at(nb["payload"], pos, n)
            jac = _jacobian(nb["payload"]["hit"], nb["payload"]["hitn"],
                            pos_nb, pos)
            nb = rsv.clamp_m(nb, M_CLAMP_SPATIAL * M_CLAMP_TEMPORAL)
            merged = rsv.merge(merged, nb, p_hat_nb, u, mask=ok,
                               w_scale=jac)
            return res13(merged), None

        import jax

        carry, _ = jax.lax.scan(tap_body, res13(cur), (dy_s, dx_s, u_s),
                                unroll=SPATIAL_UNROLL)
        cur = unres13(carry)

    return cur, next_state


# Spatial tap scan unroll factor: the scan body alone measured ~1.5 ms/tap
# on-chip (tools/micro_restir.py) — per-iteration dispatch + broken fusion,
# not bandwidth. Unrolling lets XLA fuse across taps; the value trades
# compile size (round-4's full unroll was dropped for compile diet) against
# runtime.
SPATIAL_UNROLL = 4

VALIDATE_PERIOD = 3


def validation_rays(state, gb_h):
    """Ray batch for the quarter-res GI reservoir re-trace
    (`diffuse_validate.rgen.hlsl`). Returns (org, d, ctx) — ctx carries
    what apply_validation needs; org/d are (qh*qw, 3) flat rays that the
    frame batches into ONE shared trace+shade wavefront with the other
    secondary rays (compile/runtime diet: one traversal+shading subgraph
    instead of one per pass)."""
    RAY_EPS = 1e-4
    pos_q = im.decimate2(gb_h["pos"])
    gn_q = im.decimate2(gb_h["geo_normal"])
    hit_q = im.decimate2(state["gi_res_payload_hit"])
    rad_q = im.decimate2(state["gi_res_payload_radiance"])

    d3, t_old = _reconnect(hit_q.reshape(-1, 3), pos_q.reshape(-1, 3))
    live = luminance(rad_q.reshape(-1, 3)) + t_old > 1e-3
    d = jnp.where(live[:, None], d3, jnp.array([0.0, 1.0, 0.0]))
    org = pos_q.reshape(-1, 3) + gn_q.reshape(-1, 3) * RAY_EPS * 8
    ctx = {"qh": hit_q.shape[0], "qw": hit_q.shape[1], "live": live,
           "t_old": t_old, "rad_q": rad_q}
    return org, d, ctx


def apply_validation(state, ctx, hit_t, fresh):
    """Second half of the reservoir validation: given the re-traced hit
    distances + fresh radiance of `validation_rays`, replace/cut stale
    reservoir lanes. Where the radiance disagrees,
      * if the hit DISTANCE still matches (same surface, changed lighting):
        replace the stored radiance, with the reference's firefly clamps on
        M and W (diffuse_validate.rgen.hlsl:96-105);
      * if the hit moved (occlusion change): only cut history and let
        M-clamping re-weigh the stale sample.
    Returns (new_state, invalidity) — invalidity (half-res, 0..1, the
    smoothstep of relative radiance change) feeds the temporal filter's
    history cut (role of temporal_validity_integrate.hlsl)."""
    hh, hw = state["gi_res_w_sum"].shape
    qh, qw = ctx["qh"], ctx["qw"]
    live, t_old, rad_q = ctx["live"], ctx["t_old"], ctx["rad_q"]

    old = rad_q.reshape(-1, 3)
    # rad_diff/invalidity as in diffuse_validate.rgen.hlsl:81-82
    rad_diff = jnp.linalg.norm(
        jnp.abs(old - fresh) / jnp.maximum(1e-3, old + fresh), axis=-1)
    inv_q = jnp.where(live, _smoothstep(0.1, 0.5, rad_diff / jnp.sqrt(3.0)),
                      0.0)
    t_new = jnp.minimum(hit_t, 1e8)
    same_hit = (jnp.abs(t_new - t_old)
                / jnp.maximum(2.0 * t_old, 1e-3)) < 0.2
    mismatch = inv_q > 0.0

    # scatter back to half res: only the top-left reservoir of each 2x2 was
    # re-traced along ITS ray; neighbors only get their history cut
    def up2(x):
        r = jnp.repeat(jnp.repeat(x.reshape((qh, qw) + x.shape[1:]), 2, 0),
                       2, 1)
        return r[:hh, :hw]

    inv_h = up2(inv_q)
    block_replace = up2(mismatch & same_hit & live) > 0.0
    block_occl = up2(mismatch & ~same_hit & live) > 0.0
    rows = jnp.arange(hh)[:, None]
    cols = jnp.arange(hw)[None, :]
    traced_lane = (rows % 2 == 0) & (cols % 2 == 0)
    # fresh payload only on the lane that was actually re-traced; its three
    # 2x2 neighbors (stale payload) and all occlusion-changed lanes just
    # get their history cut
    replace = block_replace & traced_lane
    cut_only = (block_replace & ~traced_lane) | block_occl

    fresh_h = up2(fresh)
    lum_old_h = luminance(state["gi_res_payload_radiance"])
    lum_new_h = luminance(fresh_h)
    ratio = lum_old_h / jnp.maximum(lum_new_h, 1e-8)
    # p_hat = lum * cos: hit point (and thus dir) unchanged on replaced
    # lanes -> rescale by the luminance ratio
    p_hat_new = jnp.where(lum_old_h > 1e-8,
                          state["gi_res_p_hat"] / jnp.maximum(ratio, 1e-8),
                          lum_new_h)

    new = dict(state)
    new["gi_res_payload_radiance"] = jnp.where(
        replace[..., None], fresh_h, state["gi_res_payload_radiance"])
    new["gi_res_p_hat"] = jnp.where(replace, p_hat_new,
                                    state["gi_res_p_hat"])
    # the reference's firefly clamps: M shrinks by the luminance ratio when
    # the scene got brighter; W allows up to a 10x increment then dims
    m_f = jnp.where(replace, jnp.clip(ratio, 0.03, 1.0), 1.0)
    w_f = jnp.where(replace, jnp.clip(ratio * 10.0, 0.01, 1.0), 1.0)
    new["gi_res_M"] = state["gi_res_M"] * m_f
    new["gi_res_W"] = state["gi_res_W"] * w_f
    # keep w_sum consistent with W = w_sum / (M * p_hat) on replaced lanes
    new["gi_res_w_sum"] = jnp.where(
        replace,
        new["gi_res_M"] * new["gi_res_W"] * jnp.maximum(new["gi_res_p_hat"],
                                                        0.0),
        state["gi_res_w_sum"])
    # occlusion-changed neighbors: proportional M cut re-weighs them fast
    m_old = new["gi_res_M"]
    factor = jnp.where(cut_only & (m_old > 1.0),
                       1.0 / jnp.maximum(m_old, 1.0), 1.0)
    new["gi_res_M"] = m_old * factor
    new["gi_res_w_sum"] = new["gi_res_w_sum"] * factor
    return new, inv_h


def validate_reservoirs(ts, state, gb_h, sky_env, diffuse_env, frame_idx,
                        prev_lit=None, prev_depth=None, view=None,
                        ircache_lookup=None, max_trace_steps=None,
                        secondary_full_shading: bool = False):
    """Standalone quarter-res reservoir validation (tests / non-batched
    callers): validation_rays -> trace -> shade -> apply_validation. The
    frame path batches the rays into its shared secondary wavefront."""
    from ..rt.trace import scene_trace_closest
    from .hit_lighting import hit_radiance

    org, d, ctx = validation_rays(state, gb_h)
    hit = scene_trace_closest(ts, org, d, t_min=1e-4,
                              max_steps=max_trace_steps)
    fresh = hit_radiance(ts, hit, d, sky_env, diffuse_env,
                         prev_lit=prev_lit, prev_depth=prev_depth,
                         view=view, ircache_lookup=ircache_lookup,
                         max_trace_steps=max_trace_steps,
                         full_shading=secondary_full_shading)
    return apply_validation(state, ctx, hit.t, fresh)


def _smoothstep(lo, hi, x):
    t = jnp.clip((x - lo) / (hi - lo), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


NEAR_FIELD_RADIUS_PX = 80.0   # `rtdgi/near_field_settings.hlsl`


def resolve(reservoir, gb, candidates=None, ssao=None, near: float = 0.01):
    """Half-res reservoirs -> full-res E/pi (restir_resolve.hlsl): 4-tap
    joint-bilateral footprint; each reservoir contributes its estimator
    L * cos(n_full, dir) * W, with the direction re-derived from the
    full-res surface point and the reconnection jacobian applied (the
    half->full offset is itself a (small) parallax shift).

    Near/far split (restir_resolve.hlsl:71-118 + near_field_settings):
    reservoir samples whose hit lies inside the near-field radius (80 px
    scaled by view depth) fade out and the pixel's OWN candidate ray covers
    that range instead — reused near hits have the wrong parallax/visibility
    at the receiver, so contact GI comes from the correctly-traced current
    sample. The split is modulated by SSAO ("near_field_influence"): in
    open areas the near field carries no energy and the (noisier) candidate
    term stays off. Enabled when `candidates`+`ssao` are passed.

    PHASE-MAJOR: instead of weaving half-res planes x 4 taps to full res
    (20+ interleave chains, ~25 ms at 1080p), compute each of the 4 output
    phases entirely at half res — every tap is then a static +-1 shift of
    a half-res plane with a CONSTANT bilinear weight — and weave the
    finished radiance once at the end (bit-identical, ~3x faster)."""
    full_h = gb["depth"].shape[0]
    vz_ph = im.phase_split(near / jnp.maximum(gb["depth"], 1e-12))
    n_ph = im.phase_split(gb["normal"])
    pos_ph = im.phase_split(gb["pos"])
    ssao_ph = im.phase_split(ssao) if ssao is not None else None
    # the half-res lattice samples full-res phase (0, 0)
    vz_h = vz_ph[0][0]
    n_h = n_ph[0][0]
    pos_h = pos_ph[0][0]
    rad_res = reservoir["payload"]["radiance"]
    hit_res = reservoir["payload"]["hit"]
    hitn_res = reservoir["payload"]["hitn"]
    w_res = reservoir["W"]
    split = candidates is not None and ssao is not None

    # one 17-channel packed half-res plane; per phase the 4 bilinear taps
    # ride a stacked (4, hh, hw, 17) axis so the reconnection/jacobian math
    # traces once per phase instead of once per tap (compile diet, round 4)
    packed_h = jnp.concatenate([
        vz_h[..., None], n_h, pos_h, hit_res, hitn_res,
        w_res[..., None], rad_res], axis=-1)

    out_ph = [[None, None], [None, None]]
    for py in (0, 1):
        for px in (0, 1):
            vz = vz_ph[py][px]
            nf = n_ph[py][px]
            pf = pos_ph[py][px]
            # near-field window scales with view depth and pixel footprint
            nf_end = vz * (NEAR_FIELD_RADIUS_PX / full_h * 0.5)
            nf_start = nf_end * 0.5
            # near_field_influence = the AO value itself
            # (restir_resolve.hlsl:77): where AO says "open", reused near
            # hits are most likely parallax-wrong, so the candidate takes
            # over; in deep corners the reservoirs keep full weight
            infl = ssao_ph[py][px] if split else None
            offs = [(ky - 1 + py, kx - 1 + px) for ky in (0, 1)
                    for kx in (0, 1)]
            bw = jnp.asarray([(0.75 if ky != py else 0.25)
                              * (0.75 if kx != px else 0.25)
                              for ky in (0, 1) for kx in (0, 1)],
                             jnp.float32)[:, None, None]
            s = im.shift_stack(packed_h, offs)        # (4, hh, hw, 17)
            zz, nn = s[..., 0], s[..., 1:4]
            owner_pos = s[..., 4:7]
            hits, hitns = s[..., 7:10], s[..., 10:13]
            ww, rad = s[..., 13], s[..., 14:17]
            w_z = jnp.exp(-jnp.abs(zz - vz) / (0.05 * vz + 1e-4))
            w_n = jnp.maximum(jnp.sum(nn * nf, axis=-1), 0.0) ** 8
            wt = bw * w_z * w_n + 1e-6
            dirs, dist = _reconnect(hits, pf)
            cosf = jnp.maximum(jnp.sum(dirs * nf, axis=-1), 0.0)
            jac = _jacobian(hits, hitns, owner_pos, pf)
            contrib = cosf * jac * ww
            if split:
                far = _smoothstep(nf_start, nf_end, dist)
                contrib = contrib * (1.0 + (far - 1.0) * infl)
            acc = jnp.sum(rad * (contrib * wt)[..., None], axis=0)
            accw = jnp.sum(wt, axis=0)
            # estimator integrates L cos / pdf == pi * E/pi; divide by pi
            e_over_pi = acc / accw[..., None] / jnp.pi
            if split:
                # the pixel's own candidate covers the faded-out near field
                # (cosine-sampled: its E/pi estimate IS the radiance)
                cdir, cdist = _reconnect(candidates["hit_pos"], pf)
                near_w = _smoothstep(nf_end, nf_start, cdist) * infl
                near_w = jnp.where(candidates["valid"], near_w, 0.0)
                e_over_pi = e_over_pi + candidates["radiance"] * near_w[..., None]
            out_ph[py][px] = e_over_pi
    return im.weave2x2(out_ph)
