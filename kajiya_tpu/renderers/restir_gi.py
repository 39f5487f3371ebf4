"""ReSTIR GI: reservoir-resampled diffuse final gather (half-res).

Role of the reference's restir chain in `renderers/rtdgi.rs:364-554`
(`restir_temporal.hlsl`, `restir_spatial.hlsl` x2, `restir_resolve.hlsl`;
doc `gi-overview.md:99-161`): candidate rays feed per-pixel reservoirs that
are resampled temporally (reprojected history) and spatially (jittered
neighbor taps with geometry similarity), multiplying the effective sample
count at ~1 traced ray per half-res pixel.

TPU re-design: reservoirs are planar arrays (ops/reservoir.py); directional
reuse (payload = radiance + ray direction + hit distance) with the target
function p_hat = luminance(L) * max(n.dir, 0); cosine-sampled candidates
enter with the constant RIS weight pi * luminance(L). Spatial taps are
static jittered offsets -> coalesced gathers instead of warp-divergent
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


def init_state(h: int, w: int):
    hh, hw = h // 2, w // 2
    payload = {
        "radiance": jnp.zeros((hh, hw, 3), jnp.float32),
        "dir": jnp.zeros((hh, hw, 3), jnp.float32),
        "t": jnp.zeros((hh, hw), jnp.float32),
    }
    r = rsv.init((hh, hw), payload)
    return {
        "gi_res_payload_radiance": r["payload"]["radiance"],
        "gi_res_payload_dir": r["payload"]["dir"],
        "gi_res_payload_t": r["payload"]["t"],
        "gi_res_w_sum": r["w_sum"],
        "gi_res_M": r["M"],
        "gi_res_W": r["W"],
        "gi_res_p_hat": r["p_hat"],
    }


def _pack(state):
    return {
        "payload": {
            "radiance": state["gi_res_payload_radiance"],
            "dir": state["gi_res_payload_dir"],
            "t": state["gi_res_payload_t"],
        },
        "w_sum": state["gi_res_w_sum"],
        "M": state["gi_res_M"],
        "W": state["gi_res_W"],
        "p_hat": state["gi_res_p_hat"],
    }


def _unpack(r):
    return {
        "gi_res_payload_radiance": r["payload"]["radiance"],
        "gi_res_payload_dir": r["payload"]["dir"],
        "gi_res_payload_t": r["payload"]["t"],
        "gi_res_w_sum": r["w_sum"],
        "gi_res_M": r["M"],
        "gi_res_W": r["W"],
        "gi_res_p_hat": r["p_hat"],
    }


def _p_hat(radiance, direction, normal):
    return luminance(radiance) * jnp.maximum(
        jnp.sum(direction * normal, axis=-1), 0.0)


def _shift2(x, dy, dx):
    return im.shift2d(x, dy, dx)


def _geo_weight(vz, vz_n, n, n_n):
    w_z = (jnp.abs(vz - vz_n) / (0.1 * vz + 1e-4)) < 1.0
    w_n = jnp.sum(n * n_n, axis=-1) > 0.7
    return w_z & w_n


def restir_diffuse(state, candidates, gb_h, reproj, frame_idx,
                   ssao_h=None, near: float = 0.01):
    """Temporal + 2 spatial reservoir passes at half res.

    candidates: dict from rtdgi.trace_candidates. Returns (reservoir dict
    for resolve, new flat state)."""
    hh, hw = gb_h["hit"].shape
    n = gb_h["normal"]
    vz = near / jnp.maximum(gb_h["depth"], 1e-12)

    px = jnp.arange(hh * hw, dtype=jnp.uint32).reshape(hh, hw)
    rng = rng_mod.pixel_rng(px % jnp.uint32(hw), px // jnp.uint32(hw),
                            jnp.uint32(frame_idx), stream=41)

    # ---- candidate reservoir (M=1)
    cand_payload = {"radiance": candidates["radiance"],
                    "dir": candidates["ray_dir"],
                    "t": candidates["ray_t"]}
    lum = luminance(candidates["radiance"])
    cosg = jnp.maximum(jnp.sum(candidates["ray_dir"] * n, axis=-1), 0.0)
    p_hat_c = lum * cosg
    w_c = jnp.pi * lum                        # p_hat / (cos/pi)
    cur = rsv.init((hh, hw), cand_payload)
    u, rng = rng_mod.rand_u01(rng)
    cur = rsv.update(cur, cand_payload, w_c, p_hat_c, u,
                     mask=candidates["valid"])

    # ---- temporal: reprojected previous reservoir (restir_temporal.hlsl)
    # one wide nearest fetch for all reservoir planes
    import jax

    prev = _pack(state)
    prev_uv = im.decimate2(reproj["prev_uv"])
    validity = im.decimate2(reproj["validity"])

    packed_prev = jnp.concatenate([
        prev["payload"]["radiance"], prev["payload"]["dir"],
        prev["payload"]["t"][..., None], prev["w_sum"][..., None],
        prev["M"][..., None], prev["W"][..., None],
        prev["p_hat"][..., None]], axis=-1)
    f = im.warp_nearest(packed_prev, prev_uv)
    prev_f = {
        "payload": {"radiance": f[..., 0:3], "dir": f[..., 3:6],
                    "t": f[..., 6]},
        "w_sum": f[..., 7], "M": f[..., 8], "W": f[..., 9],
        "p_hat": f[..., 10],
    }
    prev_f = rsv.clamp_m(prev_f, M_CLAMP_TEMPORAL)
    p_hat_t = _p_hat(prev_f["payload"]["radiance"], prev_f["payload"]["dir"], n)
    u, rng = rng_mod.rand_u01(rng)
    cur = rsv.merge(cur, prev_f, p_hat_t, u,
                    mask=(validity > 0.5) & candidates["valid"])

    # ---- spatial x2 (restir_spatial.hlsl): golden-angle spiral taps with
    # the rotation quantized to (8, 128) hardware tiles. The reference
    # already quantizes its spiral rotation to 8x8 pixel blocks for cache
    # coherence (restir_spatial.hlsl:108-119); quantizing to the VMEM tile
    # turns every tap into a pure-DMA tile_shift (ops/tileshift_pallas.py)
    # instead of a per-pixel gather/warp — ~6x cheaper per tap. All
    # reservoir planes + geometry guides are PACKED into one wide array so
    # each tap moves 15 channels in one kernel pass. Sample counts match
    # restir_spatial.hlsl:75-76 (8 incl. center, then 5 incl. center).
    from ..ops import tileshift_pallas as tsp

    def pack(res):
        return jnp.concatenate([
            res["payload"]["radiance"], res["payload"]["dir"],
            res["payload"]["t"][..., None], res["w_sum"][..., None],
            res["M"][..., None], res["W"][..., None],
            res["p_hat"][..., None], n, vz[..., None]], axis=-1)

    def unpack(p):
        return ({"payload": {"radiance": p[..., 0:3], "dir": p[..., 3:6],
                             "t": p[..., 6]},
                 "w_sum": p[..., 7], "M": p[..., 8], "W": p[..., 9],
                 "p_hat": p[..., 10]},
                p[..., 11:14], p[..., 14])          # reservoir, n_nb, vz_nb

    GOLDEN_ANGLE = 2.39996323
    nty, ntx = tsp.tile_grid(hh, hw)
    trow = jnp.arange(nty * ntx, dtype=jnp.uint32)
    for pass_idx, (radius, n_taps) in enumerate(((12.0, 7), (6.0, 4))):
        packed = pack(cur)
        merged = cur
        t_rng = rng_mod.pixel_rng(trow % jnp.uint32(ntx),
                                  trow // jnp.uint32(ntx),
                                  jnp.uint32(frame_idx), stream=47 + pass_idx)
        u_ang, t_rng = rng_mod.rand_u01(t_rng)            # (nt,) per-tile
        for k in range(1, n_taps + 1):
            ang = (k + u_ang) * GOLDEN_ANGLE
            r = jnp.sqrt(k / n_taps) * radius
            dy = jnp.round(jnp.sin(ang) * r).astype(jnp.int32)
            dx = jnp.round(jnp.cos(ang) * r).astype(jnp.int32)
            nb, n_nb, vz_nb = unpack(tsp.tile_shift(packed, dy, dx))
            ok = _geo_weight(vz, vz_nb, n, n_nb) & candidates["valid"]
            p_hat_nb = _p_hat(nb["payload"]["radiance"], nb["payload"]["dir"], n)
            nb = rsv.clamp_m(nb, M_CLAMP_SPATIAL * M_CLAMP_TEMPORAL)
            u, rng = rng_mod.rand_u01(rng)
            merged = rsv.merge(merged, nb, p_hat_nb, u, mask=ok)
        cur = merged

    return cur, _unpack(cur)


VALIDATE_PERIOD = 3


def validate_reservoirs(ts, state, gb_h, sky_env, diffuse_env, frame_idx,
                        prev_lit=None, prev_depth=None, view=None,
                        ircache_lookup=None, max_trace_steps=None,
                        secondary_full_shading: bool = False):
    """Quarter-res re-trace of stored GI reservoir rays
    (`diffuse_validate.rgen.hlsl`, every 3rd frame, `rtdgi.rs:294`,
    `gi-overview.md:163-177`): sample the stored ray again; where the
    radiance disagrees,
      * if the hit DISTANCE still matches (same surface, changed lighting):
        replace the stored radiance, with the reference's firefly clamps on
        M and W (diffuse_validate.rgen.hlsl:96-105);
      * if the hit moved (occlusion change): only cut history and let
        M-clamping re-weigh the stale sample.
    Returns (new_state, invalidity) — invalidity (half-res, 0..1, the
    smoothstep of relative radiance change) feeds the temporal filter's
    history cut (role of temporal_validity_integrate.hlsl).

    The ray origin is re-derived from the CURRENT g-buffer surface at the
    reservoir's pixel (the reference keeps an explicit ray_orig_history;
    after reprojection both name ~the same surface point)."""
    from ..rt.trace import scene_trace_closest
    from .hit_lighting import hit_radiance

    RAY_EPS = 1e-4
    hh, hw = state["gi_res_payload_t"].shape
    pos_q = im.decimate2(gb_h["pos"])
    gn_q = im.decimate2(gb_h["geo_normal"])
    dir_q = im.decimate2(state["gi_res_payload_dir"])
    rad_q = im.decimate2(state["gi_res_payload_radiance"])
    t_q = im.decimate2(state["gi_res_payload_t"])
    qh, qw = dir_q.shape[:2]

    d = dir_q.reshape(-1, 3)
    live = jnp.linalg.norm(d, axis=-1) > 0.5
    d = jnp.where(live[:, None], d, jnp.array([0.0, 1.0, 0.0]))
    org = pos_q.reshape(-1, 3) + gn_q.reshape(-1, 3) * RAY_EPS * 8
    hit = scene_trace_closest(ts, org, d, t_min=RAY_EPS,
                              max_steps=max_trace_steps)
    fresh = hit_radiance(ts, hit, d, sky_env, diffuse_env,
                         prev_lit=prev_lit, prev_depth=prev_depth, view=view,
                         ircache_lookup=ircache_lookup,
                         max_trace_steps=max_trace_steps,
                         full_shading=secondary_full_shading)

    old = rad_q.reshape(-1, 3)
    # rad_diff/invalidity as in diffuse_validate.rgen.hlsl:81-82
    rad_diff = jnp.linalg.norm(
        jnp.abs(old - fresh) / jnp.maximum(1e-3, old + fresh), axis=-1)
    inv_q = jnp.where(live, _smoothstep(0.1, 0.5, rad_diff / jnp.sqrt(3.0)),
                      0.0)
    t_new = jnp.minimum(hit.t, 1e8)
    t_old = t_q.reshape(-1)
    same_hit = (jnp.abs(t_new - t_old)
                / jnp.maximum(2.0 * t_old, 1e-3)) < 0.2
    mismatch = inv_q > 0.0

    # scatter back to half res: only the top-left reservoir of each 2x2 was
    # re-traced along ITS dir; neighbors only get their history cut
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
    # 2x2 neighbors (stale dir/radiance) and all occlusion-changed lanes
    # just get their history cut
    replace = block_replace & traced_lane
    cut_only = (block_replace & ~traced_lane) | block_occl

    fresh_h = up2(fresh)
    t_h = up2(t_new)
    lum_old_h = luminance(state["gi_res_payload_radiance"])
    lum_new_h = luminance(fresh_h)
    ratio = lum_old_h / jnp.maximum(lum_new_h, 1e-8)
    # p_hat = lum * cos: dir unchanged -> rescale by the luminance ratio
    p_hat_new = jnp.where(lum_old_h > 1e-8,
                          state["gi_res_p_hat"] / jnp.maximum(ratio, 1e-8),
                          lum_new_h)

    new = dict(state)
    new["gi_res_payload_radiance"] = jnp.where(
        replace[..., None], fresh_h, state["gi_res_payload_radiance"])
    new["gi_res_payload_t"] = jnp.where(replace, t_h,
                                        state["gi_res_payload_t"])
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


def _smoothstep(lo, hi, x):
    t = jnp.clip((x - lo) / (hi - lo), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def resolve(reservoir, gb, near: float = 0.01):
    """Half-res reservoirs -> full-res E/pi (restir_resolve.hlsl): 4-tap
    joint-bilateral footprint; each reservoir contributes its unbiased
    estimator L * cos(n_full, dir) * W.

    PHASE-MAJOR: instead of weaving 5 half-res planes x 4 taps to full res
    (20 interleave chains, ~25 ms at 1080p), compute each of the 4 output
    phases entirely at half res — every tap is then a static +-1 shift of
    a half-res plane with a CONSTANT bilinear weight — and weave the
    finished radiance once at the end (bit-identical, ~3x faster)."""
    vz_ph = im.phase_split(near / jnp.maximum(gb["depth"], 1e-12))
    n_ph = im.phase_split(gb["normal"])
    # the half-res lattice samples full-res phase (0, 0)
    vz_h = vz_ph[0][0]
    n_h = n_ph[0][0]
    rad_res = reservoir["payload"]["radiance"]
    dir_res = reservoir["payload"]["dir"]
    w_res = reservoir["W"]

    out_ph = [[None, None], [None, None]]
    for py in (0, 1):
        for px in (0, 1):
            vz = vz_ph[py][px]
            nf = n_ph[py][px]
            acc = jnp.zeros_like(rad_res)
            accw = jnp.zeros_like(w_res)
            for ky in (0, 1):
                for kx in (0, 1):
                    dy, dx = ky - 1 + py, kx - 1 + px
                    bw = ((0.75 if ky != py else 0.25)
                          * (0.75 if kx != px else 0.25))
                    zz = im.shift2d(vz_h, dy, dx)
                    nn = im.shift2d(n_h, dy, dx)
                    w_z = jnp.exp(-jnp.abs(zz - vz) / (0.05 * vz + 1e-4))
                    w_n = jnp.maximum(jnp.sum(nn * nf, axis=-1), 0.0) ** 8
                    wt = bw * w_z * w_n + 1e-6
                    dirs = im.shift2d(dir_res, dy, dx)
                    cosf = jnp.maximum(jnp.sum(dirs * nf, axis=-1), 0.0)
                    ww = im.shift2d(w_res, dy, dx)
                    rad = im.shift2d(rad_res, dy, dx)
                    acc = acc + rad * (cosf * ww * wt)[..., None]
                    accw = accw + wt
            # estimator integrates L cos / pdf == pi * E/pi; divide by pi
            out_ph[py][px] = acc / accw[..., None] / jnp.pi
    return im.weave2x2(out_ph)
