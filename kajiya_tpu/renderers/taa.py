"""Temporal anti-aliasing / super-resolution — full reference chain.

Role of `renderers/taa.rs:41-192` + `assets/shaders/taa/*`. The reference
runs 7 dispatches per frame:

  1. reproject_history.hlsl   — warp history by the dilated closest velocity
  2. filter_input.hlsl        — depth-aware 3x3 input filter + deviation
  3. filter_history.hlsl      — luma-clamped 3x3 filter of the warped history
  4. input_prob.hlsl          — P(input belongs to history's distribution)
  5. filter_prob.hlsl         — 3x3 max of the probability
  6. filter_prob2.hlsl        — 5x5 dilated soft mean (exponential squish)
  7. taa.hlsl                 — coverage-accumulated dual-frequency resolve

TPU design: the chain keeps the reference's data flow but every neighborhood
op is a static pad-shift stencil (fused by XLA into the surrounding
elementwise work — zero gathers), and all temporal fetches collapse into ONE
packed 9-channel warp (history 3 + coverage 1 + smooth-var 3 + velocity 2)
at the dilated reprojection lattice. Temporal state:

  taa_history   (Ho,Wo,3) linear radiance accumulator
  taa_coverage  (Ho,Wo)   effective sample count (reference alpha channel)
  taa_smooth_var(Ho,Wo,3) temporally smoothed input variance
  taa_velocity  (Ho,Wo,2) previous frame's closest velocity (uv/frame)

Super-resolution (`temporal_upsampling > 1`, `main_loop.rs:153-159`): the
current frame is gathered to the output lattice with the analytic unjitter
kernel of `inc/unjitter_taa.hlsl` — 9 input taps pre-shifted at render res,
packed into one 27-channel nearest warp, with per-output-pixel analytic
weights (coverage = wt_sum varies per phase, exactly as in the reference).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..core.profiling import pass_scope

from ..core import img as im
from ..core.color import lin_to_ycbcr, luminance, ycbcr_to_lin

_OFF3 = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def init_state(out_h: int, out_w: int):
    return {
        "taa_history": jnp.zeros((out_h, out_w, 3), jnp.float32),
        "taa_coverage": jnp.zeros((out_h, out_w), jnp.float32),
        "taa_smooth_var": jnp.zeros((out_h, out_w, 3), jnp.float32),
        "taa_velocity": jnp.zeros((out_h, out_w, 2), jnp.float32),
    }


# --- perceptual mapping (taa_common.hlsl, TAA_NONLINEARITY_TYPE 1,
#     TAA_COLOR_MAPPING_MODE 1: scale rgb by sqrt(max)/max)
def decode_rgb(v):
    m = jnp.maximum(jnp.max(v, axis=-1, keepdims=True), 0.0)
    return v * jnp.sqrt(m) / jnp.maximum(m, 1e-20)


def encode_rgb(v):
    m = jnp.max(v, axis=-1, keepdims=True)
    return v * (jnp.maximum(m, 0.0) ** 2) / jnp.maximum(m, 1e-20)


def _len3(v):
    return jnp.sqrt(jnp.maximum(
        v[..., 0] ** 2 + v[..., 1] ** 2 + v[..., 2] ** 2, 0.0))


def _len2(v):
    return jnp.sqrt(jnp.maximum(v[..., 0] ** 2 + v[..., 1] ** 2, 0.0))


def _closest_velocity(depth, vel):
    """3x3 velocity dilation toward the closest surface
    (reproject_history.hlsl's dilation; reversed-Z: larger depth = closer)."""
    packed = jnp.concatenate([depth[..., None], vel], axis=-1)
    s = im.shift_stack(packed, _OFF3)                # (9, H, W, 3)
    k = jnp.argmax(s[..., 0], axis=0)                # closest tap index
    sel = (jnp.arange(len(_OFF3))[:, None, None] == k)[..., None]
    best = jnp.sum(jnp.where(sel, s, 0.0), axis=0)   # one-hot select, dense
    return best[..., 1:3]


def _filter_input(iycc, depth, k_dist: float):
    """filter_input.hlsl: two 3x3 passes. Pass 1 is depth-weighted (also
    accumulating the unweighted moments for the deviation); pass 2 repeats
    with a luma cutoff at pass 1's mean (clamps bright outliers).
    Returns (filtered (H,W,3), deviation (H,W,3))."""
    packed = jnp.concatenate([iycc, depth[..., None]], axis=-1)
    s = im.shift_stack(packed, _OFF3)                # (9, H, W, 4)
    sy, sd = s[..., :3], s[..., 3]
    d_c = jnp.maximum(depth, 1e-20)
    kd = jnp.asarray([math.exp(-k_dist * (dy * dy + dx * dx))
                      for dy, dx in _OFF3], jnp.float32)[:, None, None]
    rel = jnp.abs(d_c / jnp.maximum(sd, 1e-20) - 1.0)
    w_base = jnp.exp2(-jnp.minimum(16.0, 200.0 * rel)) * kd  # (9, H, W)

    def one_pass(cutoff):
        w = w_base
        if cutoff is not None:
            w = w * jnp.clip(cutoff / jnp.maximum(sy[..., 0], 1e-20),
                             0.0, 1.0) ** 8
        wsum = jnp.sum(w, axis=0)
        ex = jnp.sum(sy * w[..., None], axis=0)
        return ex / jnp.maximum(wsum, 1e-20)[..., None]

    # unweighted moments -> deviation
    m1 = sy.mean(axis=0)
    m2 = (sy ** 2).mean(axis=0)
    dev = jnp.sqrt(jnp.maximum(m2 - m1 * m1, 0.0))

    mean1 = one_pass(None)
    filtered = one_pass(mean1[..., 0] * 1.001)
    return filtered, dev


def _filter_history(hycc, k: int):
    """filter_history.hlsl at render res: two luma-cutoff passes with
    distance weights exp(-0.8/k^2 * d^2), radius k."""
    offs = [(dy, dx) for dy in range(-k, k + 1) for dx in range(-k, k + 1)]
    s = im.shift_stack(hycc, offs)                   # (N, H, W, 3)
    dw = jnp.asarray([math.exp(-(0.8 / (k * k)) * (dy * dy + dx * dx))
                      for dy, dx in offs], jnp.float32)[:, None, None]

    def one_pass(cutoff):
        if cutoff is None:
            w = jnp.broadcast_to(dw, s.shape[:3])
        else:
            w = dw * jnp.clip(cutoff / jnp.maximum(s[..., 0], 1e-20),
                              0.0, 1.0) ** 8
        return (jnp.sum(s * w[..., None], axis=0)
                / jnp.maximum(jnp.sum(w, axis=0), 1e-20)[..., None])

    luma = one_pass(None)[..., 0]
    return one_pass(luma * 1.001)


def _input_prob(fi, dev, vel, closest_hist, smooth_var_rr, vel_hist_rr):
    """input_prob.hlsl + filter_prob.hlsl + filter_prob2.hlsl."""
    # spatial variance: 3x3 max of the deviation at stride-2 taps
    ivar = im.shift_stack(dev, [(dy * 2, dx * 2) for dy, dx in _OFF3]
                          ).max(axis=0)
    ivar = ivar * ivar
    combined_var = jnp.minimum(smooth_var_rr, ivar * 10.0)

    packed = jnp.concatenate([fi, vel], axis=-1)
    s = im.shift_stack(packed, _OFF3)                # (9, H, W, 5)
    idiff = s[..., :3] - closest_hist
    v = s[..., 3:5]
    vdiff = _len2((v - vel_hist_rr)
                  / jnp.maximum(1.0, jnp.abs(v + vel_hist_rr)))
    prob = jnp.exp2(-_len3(idiff * idiff
                           / jnp.maximum(combined_var, 1e-6))
                    - 1000.0 * vdiff).max(axis=0)

    # filter_prob.hlsl: 3x3 max
    f1 = im.shift_stack(prob, _OFF3).max(axis=0)

    # filter_prob2.hlsl: 5x5 dilated mean in exponential-squish space
    sq = jnp.exp2(-jnp.clip(10.0 * f1, 0.0, 100.0))
    offs5 = [(dy * 2, dx * 2) for dy in (-2, -1, 0, 1, 2)
             for dx in (-2, -1, 0, 1, 2)]
    acc = im.shift_stack(sq, offs5).mean(axis=0)
    return jnp.maximum(0.0, -0.1 * jnp.log2(1e-30 + acc))


def _unjitter_sample(iycc, jitter_px, h, w, out_h, out_w, kernel_scale):
    """inc/unjitter_taa.hlsl `sample_image_unjitter_taa`: gather the current
    frame to the output lattice, un-doing the sub-pixel jitter with an
    analytic kernel. Returns (color_sum, coverage, ex, ex2).

    Same-res: taps are static shifts, offsets are traced scalars (the whole
    kernel is 9 shift-multiply-adds). Upsampling: 9 pre-shifted taps packed
    into one 27-channel nearest warp + per-pixel analytic weights."""
    same_res = (out_h == h and out_w == w)
    jx, jy = jitter_px[0], jitter_px[1]

    if same_res:
        col = im.shift_stack(iycc, _OFF3)            # (9, H, W, 3)
        dyx = jnp.asarray(_OFF3, jnp.float32)        # (9, 2)
        ox = (dyx[:, 1] + jx) * kernel_scale
        oy = (dyx[:, 0] + jy) * kernel_scale
        d2 = (ox * ox + oy * oy)[:, None, None, None]    # (9,1,1,1)
        dev_wt = jnp.exp2(-d2)
        wt = jnp.exp2(-10.0 * d2)
        res = jnp.sum(col * wt, axis=0)
        wt_sum = jnp.sum(wt, axis=0)[..., 0]
        ex = jnp.sum(col * dev_wt, axis=0)
        ex2 = jnp.sum(col * col * dev_wt, axis=0)
        dev_wt_sum = jnp.sum(dev_wt, axis=0)
        cov = jnp.broadcast_to(wt_sum, (out_h, out_w))
        return res, cov, ex / dev_wt_sum, ex2 / dev_wt_sum

    # --- super-res path
    sx, sy = w / out_w, h / out_h  # input_resolution_fraction (< 1)
    ox_pix = (jnp.arange(out_w, dtype=jnp.float32) + 0.5)[None, :]
    oy_pix = (jnp.arange(out_h, dtype=jnp.float32) + 0.5)[:, None]
    bx = jnp.floor(ox_pix * sx)  # base_src_px
    by = jnp.floor(oy_pix * sy)
    # fractional offset of (base src texel + jitter) vs the output sample,
    # in OUTPUT pixel units
    fx = (bx + 0.5 + jx) / sx - ox_pix
    fy = (by + 0.5 + jy) / sy - oy_pix
    fx = jnp.broadcast_to(fx, (out_h, out_w))
    fy = jnp.broadcast_to(fy, (out_h, out_w))

    # one 27-channel nearest warp of the 9 pre-shifted taps
    shifted = jnp.concatenate(
        [im.shift2d(iycc, dy, dx) for dy, dx in _OFF3], axis=-1)
    base_uv = jnp.stack([jnp.broadcast_to((bx + 0.5) / w, (out_h, out_w)),
                         jnp.broadcast_to((by + 0.5) / h, (out_h, out_w))],
                        axis=-1)
    fetched = im.warp_nearest(shifted, base_uv)

    col = fetched.reshape(out_h, out_w, 9, 3).transpose(2, 0, 1, 3)
    dyx = jnp.asarray(_OFF3, jnp.float32)
    ox = (fx[None] + (dyx[:, 1] / sx)[:, None, None]) * kernel_scale
    oy = (fy[None] + (dyx[:, 0] / sy)[:, None, None]) * kernel_scale
    d2 = (ox * ox + oy * oy) * sx                    # (9, H, W)
    dev_wt = jnp.exp2(-d2)[..., None]
    wt = jnp.exp2(-10.0 * d2)[..., None]
    res = jnp.sum(col * wt, axis=0)
    wt_sum = jnp.sum(wt, axis=0)
    ex = jnp.sum(col * dev_wt, axis=0)
    ex2 = jnp.sum(col * col * dev_wt, axis=0)
    dev_wt_sum = jnp.sum(dev_wt, axis=0)
    return (res, wt_sum[..., 0],
            ex / jnp.maximum(dev_wt_sum, 1e-20),
            ex2 / jnp.maximum(dev_wt_sum, 1e-20))


def _to_out(x, out_h, out_w):
    """Nearest resize render-res -> output-res (reproj_px lattice)."""
    if x.shape[0] == out_h and x.shape[1] == out_w:
        return x
    return im.warp_nearest(x if x.ndim == 3 else x[..., None],
                           im.pixel_uv(out_h, out_w))


def _to_render(x, h, w):
    """Nearest resize output-res -> render-res."""
    if x.shape[0] == h and x.shape[1] == w:
        return x
    return im.warp_nearest(x, im.pixel_uv(h, w))


def taa(input_img, state, reproj, depth, jitter_px, out_h: int, out_w: int,
        pre_delta=None):
    """input_img: (H, W, 3) lit radiance at render res (PRE-EXPOSED when the
    pre-exposure split is active); depth: (H, W) reversed-Z g-buffer depth.
    pre_delta: this frame's pre-exposure multiplier over last frame's —
    history was accumulated at the old pre-exposure, so its radiance is
    rescaled by pre_delta (and the variance accumulator by the same factor:
    it lives in sqrt-encoded space, where a linear scale k becomes √k per
    channel, k on the squared deviation) exactly as the reference's
    `reproject_history.hlsl:24` / `temporal_filter.hlsl:102`.
    Returns ((out_h, out_w, 3), new_state)."""
    h, w = input_img.shape[:2]
    same_res = (out_h == h and out_w == w)
    frac_x, frac_y = w / out_w, h / out_h

    # ---- pass 2: filter input (+ deviation) at render res, perceptual YCbCr
    iycc_raw = lin_to_ycbcr(decode_rgb(input_img))
    with pass_scope("filter_input"):
        fi, dev = _filter_input(iycc_raw, depth, 0.8)

    # ---- closest-velocity dilation at render res
    uv_rr = im.pixel_uv(h, w)
    vel = reproj["prev_uv"] - uv_rr
    with pass_scope("closest_vel"):
        cvel_rr = _closest_velocity(depth, vel)

    # ---- pass 1: reproject ALL temporal planes with one packed 9ch warp,
    # at the dilated closest-velocity lattice (reproject_history.hlsl)
    uv_out = im.pixel_uv(out_h, out_w)
    cvel_out = _to_out(cvel_rr, out_h, out_w)
    prev_uv_out = uv_out + cvel_out
    packed = jnp.concatenate([state["taa_history"],
                              state["taa_coverage"][..., None],
                              state["taa_smooth_var"],
                              state["taa_velocity"]], axis=-1)
    with pass_scope("warp9"):
        fetched = im.warp_bilinear(packed, prev_uv_out)
    hist_lin = jnp.maximum(fetched[..., 0:3], 0.0)
    rsvar = jnp.maximum(fetched[..., 4:7], 0.0)
    if pre_delta is not None:
        # history is stored LINEAR: scale it by the full delta BEFORE the
        # perceptual decode (decode is homogeneous of degree 1/2, so the
        # sqrt-encoded value scales by sqrt(delta)); the variance
        # accumulator lives in sqrt-encoded space and scales by delta.
        hist_lin = hist_lin * pre_delta
        rsvar = rsvar * pre_delta
    rhist = decode_rgb(hist_lin)                             # perceptual
    rcov = jnp.maximum(fetched[..., 3], 0.0)
    rvel = fetched[..., 7:9]

    # ---- pass 3: filtered history at render res
    hist_rr = _to_render(rhist, h, w)
    with pass_scope("filter_history"):
        fh = _filter_history(_ycc(hist_rr), 2 if 1.0 / frac_x > 1.75 else 1)

    # ---- passes 4-6: input probability
    svar_rr = _to_render(rsvar, h, w)
    vhist_rr = _to_render(rvel, h, w)
    with pass_scope("input_prob"):
        prob_rr = _input_prob(fi, dev, vel, fh, svar_rr, vhist_rr)
    input_prob = _to_out(prob_rr, out_h, out_w)[..., 0] \
        if not same_res else prob_rr

    # ---- pass 7: final resolve at output res (taa.hlsl)
    hist_ycc = _ycc(rhist)
    hcov = rcov

    # blurred history: separable gaussian, sigma such that w = exp(-d^2)
    g = [math.exp(-(d * d)) for d in (-2, -1, 0, 1, 2)]
    gs = sum(g)
    taps = tuple(x / gs for x in g)
    bhist_p = im.separable_blur(
        jnp.concatenate([rhist, rcov[..., None]], axis=-1), taps)
    bhist_ycc = _ycc(bhist_p[..., 0:3])
    bcov = bhist_p[..., 3]

    with pass_scope("unjitter"):
        center_sum, coverage, ex, ex2 = _unjitter_sample(
            iycc_raw, jitter_px, h, w, out_h, out_w, 1.0)
        bsum, bcover, _, _ = _unjitter_sample(
            iycc_raw, jitter_px, h, w, out_h, out_w, 0.333)
    center = center_sum
    bcenter = bsum / jnp.maximum(bcover, 1e-20)[..., None]

    # low-coverage lanes fall back to the filtered current frame
    hist_ycc = hist_ycc + (bcenter - hist_ycc) * jnp.clip(
        1.0 - hcov, 0.0, 1.0)[..., None]
    bhist_ycc = bhist_ycc + (bcenter - bhist_ycc) * jnp.clip(
        1.0 - bcov, 0.0, 1.0)[..., None]

    var = jnp.maximum(ex2 - ex * ex, 0.0)
    input_dev = jnp.sqrt(var)

    # smooth variance update
    prev_var = rsvar[..., 0:1]
    validity_out = _to_out(reproj["validity"], out_h, out_w)[..., 0] \
        if not same_res else reproj["validity"]
    in_bounds_out = _to_out(reproj["in_bounds"], out_h, out_w)[..., 0] \
        if not same_res else reproj["in_bounds"]
    vel_now = cvel_out
    vel_prev = rvel
    vel_diff = _len2((vel_now - vel_prev)
                     / jnp.maximum(1.0, jnp.abs(vel_now + vel_prev)))
    var_blend = jnp.clip(0.3 + 0.7 * (1.0 - validity_out) + vel_diff,
                         0.0, 1.0)[..., None]
    # lerp(prev_var, var, var_blend), bounded below by this frame's var
    smooth_var = jnp.maximum(var, prev_var
                             + (var - prev_var) * var_blend)
    var_prob_blend = jnp.clip(input_prob, 0.0, 1.0)[..., None]
    smooth_var = var + (smooth_var - var) * var_prob_blend

    # ---- neighborhood clamp / dual-frequency history reconstruction
    box_n = 0.8 + (3.0 - 0.8) * var_prob_blend
    nmin = ex - input_dev * box_n
    nmax = ex + input_dev * box_n
    clamped_bhistory = jnp.clip(bhist_ycc, nmin, nmax)

    clamping_event = _len3(
        jnp.maximum(0.0, jnp.maximum(bhist_ycc - nmax, nmin - bhist_ycc))
        / jnp.maximum(0.01, ex))
    outlier3 = jnp.maximum(
        0.0, jnp.maximum(nmin - hist_ycc, hist_ycc - nmax)) / (
        0.1 + jnp.maximum(jnp.maximum(jnp.abs(hist_ycc), jnp.abs(ex)), 1e-5))
    boutlier3 = jnp.maximum(
        0.0, jnp.maximum(nmin - bhist_ycc, bhist_ycc - nmax)) / (
        0.1 + jnp.maximum(jnp.maximum(jnp.abs(bhist_ycc), jnp.abs(ex)), 1e-5))
    outlier = jnp.max(outlier3, axis=-1)
    boutlier = jnp.max(boutlier3, axis=-1)

    non_disocc = jnp.maximum(0.0, outlier - boutlier) * 10.0
    unclamped_detail = hist_ycc - clamped_bhistory
    temporal_clamping_detail = jnp.abs(
        unclamped_detail[..., 0] / jnp.maximum(input_dev[..., 0], 1e-3)
    ) * 0.05
    temporal_stability = jnp.clip(1.0 - temporal_clamping_detail, 0.0, 1.0)
    allow_unclamped = jnp.clip(non_disocc, 0.0, 1.0) * temporal_stability

    history_detail = hist_ycc - bhist_ycc
    history_detail = history_detail + (
        unclamped_detail - history_detail) * allow_unclamped[..., None]

    dot_num = jnp.sum((clamped_bhistory - bhist_ycc)
                      * (bcenter - bhist_ycc), axis=-1)
    denom = jnp.maximum(1e-5, _len3(clamped_bhistory - bhist_ycc)
                        * _len3(bcenter - bhist_ycc))
    initial_bclamp = jnp.clip(dot_num / denom, 0.0, 1.0)
    effective_clamp = initial_bclamp * (1.0 - allow_unclamped)
    keep_detail = 1.0 - effective_clamp
    history_detail = history_detail * keep_detail[..., None]

    clamped_history_v = clamped_bhistory + history_detail
    if frac_x < 1.0:
        # temporal super-res: damp coverage after clamping events so the
        # reduced-res input re-converges quickly (taa.hlsl)
        hcov = hcov * ((0.9 * keep_detail)
                       + (1.0 - 0.9 * keep_detail)
                       * jnp.clip(10.0 * clamping_event, 0.0, 1.0))

    history_valid = in_bounds_out > 0.5
    clamped_history_v = jnp.where(history_valid[..., None],
                                  clamped_history_v, clamped_bhistory)
    center = jnp.where(history_valid[..., None], center, bcenter)
    coverage = jnp.where(history_valid, coverage, 1.0)
    hcov = jnp.where(history_valid, hcov, 0.0)

    # confidence-based blend: high input probability keeps unclamped history
    conf = jnp.clip((var_prob_blend[..., 0] - 0.5) / 0.5, 0.0, 1.0)
    conf = conf * conf * (3.0 - 2.0 * conf)  # smoothstep(0.5, 1, prob)
    clamped_history_v = clamped_history_v + (
        hist_ycc - clamped_history_v) * conf[..., None]

    # ---- coverage-weighted accumulation
    total_cov = jnp.maximum(1e-5, hcov + coverage)
    temporal = (clamped_history_v * hcov[..., None] + center) \
        / total_cov[..., None]
    max_cov = max(2.0, 8.0 / (frac_x * frac_y))  # TARGET_SAMPLE_COUNT 8
    total_cov = jnp.minimum(total_cov, max_cov)

    out_lin = jnp.maximum(encode_rgb(_ycc_inv(temporal)), 0.0)

    new_state = {
        "taa_history": out_lin,
        "taa_coverage": total_cov,
        "taa_smooth_var": smooth_var,
        "taa_velocity": cvel_out,
    }
    return out_lin, new_state


def _ycc(rgb):
    return lin_to_ycbcr(rgb)


def _ycc_inv(ycc):
    return ycbcr_to_lin(ycc)


__all__ = ["init_state", "taa", "decode_rgb", "encode_rgb", "luminance"]
