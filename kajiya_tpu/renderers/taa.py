"""Temporal anti-aliasing / super-resolution.

Role of `renderers/taa.rs:41-192` + `assets/shaders/taa/*` (reproject history,
filter input + deviation, filter history, input probability, final resolve)
and of the upsampling configured via `temporal_upsampling`
(`main_loop.rs:153-159`): render at (H, W), accumulate at (Ho, Wo) >= (H, W).

TPU design: one fused elementwise/gather pass chain — history is reprojected
with bilinear taps, the new input is variance-clamped in a YCbCr-ish space
against the 3x3 neighborhood (soft clamp, cf. `inc/soft_color_clamp.hlsl`),
and the blend factor follows history validity and velocity magnitude.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import img as im
from ..core.color import lin_to_ycbcr, ycbcr_to_lin


def init_state(out_h: int, out_w: int):
    return {
        "taa_history": jnp.zeros((out_h, out_w, 3), jnp.float32),
        "taa_valid": jnp.zeros((out_h, out_w), jnp.float32),
    }


def taa(input_img, state, reproj, jitter_px, out_h: int, out_w: int):
    """input_img: (H, W, 3) lit radiance at render res. Returns
    ((out_h, out_w, 3) antialiased, new_state)."""
    h, w = input_img.shape[:2]
    same_res = (out_h == h and out_w == w)

    # --- fetch input at output res, compensating the sub-pixel jitter
    # (taa.hlsl samples input with the jitter removed). At native res this
    # is a constant sub-pixel shift -> gather-free static-shift blend.
    inp_ycc = lin_to_ycbcr(input_img)
    m1, var = im.local_moments_3x3(inp_ycc)
    if same_res:
        input_up = im.sample_const_offset(input_img, -jitter_px[0],
                                          -jitter_px[1])
        m1_up = im.sample_const_offset(m1, -jitter_px[0], -jitter_px[1])
        var_up = jnp.maximum(
            im.sample_const_offset(var, -jitter_px[0], -jitter_px[1]), 0.0)
        prev_uv = reproj["prev_uv"]
        validity = reproj["validity"]
    else:
        uv_out = im.pixel_uv(out_h, out_w)
        jitter_uv = jnp.stack([jitter_px[0] / w, jitter_px[1] / h])
        # two packed warps instead of five: input/moments at the jitter-
        # compensated lattice, reprojection planes at the plain lattice
        pack_in = jnp.concatenate([input_img, m1, var], axis=-1)
        f_in = im.warp_bilinear(pack_in, uv_out - jitter_uv)
        input_up = f_in[..., 0:3]
        m1_up = f_in[..., 3:6]
        var_up = jnp.maximum(f_in[..., 6:9], 0.0)
        pack_rp = jnp.concatenate([reproj["prev_uv"],
                                   reproj["validity"][..., None]], axis=-1)
        # exact: the channels are COORDINATES (prev_uv) — bf16 rounding of
        # a uv is up to ~2 px of history-fetch error at 1080p
        f_rp = im.warp_bilinear(pack_rp, uv_out, exact=True)
        prev_uv = f_rp[..., 0:2]
        validity = f_rp[..., 2]

    # --- reproject history through the velocity of the closest surface
    # (history + validity packed: one wide gather)
    packed = jnp.concatenate([state["taa_history"],
                              state["taa_valid"][..., None]], axis=-1)
    fetched = im.warp_bilinear(packed, prev_uv)
    history = fetched[..., :3]
    hist_valid = fetched[..., 3] * validity
    sigma = jnp.sqrt(var_up)

    # --- soft clamp history toward the input neighborhood box
    hist_ycc = lin_to_ycbcr(history)
    n_dev = 2.4
    lo = m1_up - sigma * n_dev
    hi = m1_up + sigma * n_dev
    clamped = jnp.clip(hist_ycc, lo, hi)
    # soft: move only part of the way for mild excursions (soft_color_clamp)
    hist_ycc = hist_ycc + (clamped - hist_ycc) * 0.75
    history_c = ycbcr_to_lin(hist_ycc)

    # --- blend factor: long history -> small alpha; invalid -> take input
    vel = prev_uv - im.pixel_uv(out_h, out_w)
    speed = jnp.linalg.norm(vel * jnp.array([w, h], jnp.float32), axis=-1)
    base_alpha = 1.0 / 8.0
    alpha = base_alpha + jnp.clip(speed * 0.05, 0.0, 0.5)
    alpha = jnp.where(hist_valid > 0.5, alpha, 1.0)[..., None]

    out = history_c + (input_up - history_c) * alpha
    out = jnp.maximum(out, 0.0)

    new_state = {
        "taa_history": out,
        "taa_valid": jnp.ones((out_h, out_w), jnp.float32),
    }
    return out, new_state
