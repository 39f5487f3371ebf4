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
