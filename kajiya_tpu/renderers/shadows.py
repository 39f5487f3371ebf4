"""Sun soft shadows: cone-sampled shadow rays + temporal/spatial denoiser.

Role of `renderers/shadows.rs:10-35` (`trace_sun_shadow_mask.rgen.hlsl`) and
`renderers/shadow_denoise.rs:20-148` (`shadow_denoise/*`: bitpack -> temporal
moments "megakernel" -> 3 a-trous spatial passes, steps 1/2/4).

TPU design: the 1-bit mask stays a dense f32 plane (bit-packing saved LDS
traffic on GPU; on TPU planar f32 keeps the VPU fed and XLA fuses the
filters). The temporal pass accumulates (mean, m2) moments with reprojection
validity; the spatial pass is the same depth/normal-guided a-trous with
variance-scaled luminance weights.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.smallvec import dot3

from ..core import img as im
from ..core import rng as rng_mod
from ..brdf.sampling import to_world, uniform_cone
from ..rt.trace import scene_trace_shadow
from .reprojection import reproject_image, reproject_planes

RAY_EPS = 1e-4


def trace_sun_shadow_mask(ts, gb, frame_idx, max_trace_steps=None):
    """(H, W) f32 mask: 1 = lit by the sun, 0 = shadowed. One cone-jittered
    ray per pixel per frame (the reference's 1.65/px budget includes GI's
    shadow rays; the primary mask itself is 1/px)."""
    h, w = gb["depth"].shape
    # blue-noise cone sample (the reference draws the sun-disk jitter from
    # its blue-noise LUT, trace_sun_shadow_mask.rgen.hlsl): neighbor pixels
    # get maximally-separated samples, so the penumbra error is
    # high-frequency and the a-trous denoiser removes it at equal spp
    from ..core import bluenoise

    bu1, bu2 = bluenoise.blue_noise_pair(h, w, frame_idx, stream=0)
    u1 = bu1.reshape(-1)
    u2 = bu2.reshape(-1)
    cos_max = jnp.cos(ts.gpu.sun_angular_radius)
    local = uniform_cone(u1, u2, cos_max)
    sun_dir = to_world(
        jnp.broadcast_to(ts.gpu.sun_direction, local.shape), local)

    pos = gb["pos"].reshape(-1, 3)
    gn = gb["geo_normal"].reshape(-1, 3)
    n = gb["normal"].reshape(-1, 3)
    facing = dot3(n, sun_dir) > 0.0
    need_ray = gb["hit"].reshape(-1) & facing
    org = pos + gn * RAY_EPS * 8
    tiled = ts.woop is not None and "cmin" in ts.woop
    if tiled:
        # screen-tile chunks keep shadow-ray frustums compact (ops/tiling.py)
        from ..ops.tiling import tile_order, untile_order

        org_t = tile_order(org.reshape(h, w, 3)).reshape(-1, 3)
        dir_t = tile_order(sun_dir.reshape(h, w, 3)).reshape(-1, 3)
        occ_t = scene_trace_shadow(ts, org_t, dir_t, t_min=RAY_EPS,
                                   max_steps=max_trace_steps)
        occ = untile_order(occ_t, h, w).reshape(-1)
    else:
        occ = scene_trace_shadow(ts, org, sun_dir,
                                 t_min=RAY_EPS, max_steps=max_trace_steps)
    lit = jnp.where(need_ray, (~occ).astype(jnp.float32), 0.0)
    return lit.reshape(h, w)


def init_state(h: int, w: int):
    """Temporal moments history (the `shadow_denoise` temporal images)."""
    return {
        "moments": jnp.zeros((h, w, 2), jnp.float32),   # (mean, mean of squares)
        "history_len": jnp.zeros((h, w), jnp.float32),
    }


def denoise(mask, state, reproj, gb, near: float = 0.01):
    """Temporal moments + 3x a-trous. Returns (filtered (H,W), new_state)."""
    fetched = reproject_planes(
        {"moments": state["moments"], "history_len": state["history_len"]},
        reproj)
    prev = fetched["moments"]
    hist_len = fetched["history_len"]
    hist_len = jnp.minimum(hist_len * reproj["validity"] + 1.0, 32.0)
    alpha = 1.0 / hist_len

    m1 = prev[..., 0] * (1 - alpha) + mask * alpha
    m2 = prev[..., 1] * (1 - alpha) + mask * mask * alpha
    var_t = jnp.maximum(m2 - m1 * m1, 0.0)
    # fresh pixels: use spatial variance estimate instead
    _, var_s = im.local_moments_3x3(mask)
    var = jnp.where(hist_len < 4.0, jnp.maximum(var_t, var_s), var_t)

    filtered = m1
    vz = near / jnp.maximum(gb["depth"], 1e-12)
    normal = gb["normal"]
    for step in (1, 2, 4):           # shadow_denoise.rs:134 step sequence
        filtered, var = _atrous(filtered, var, vz, normal, step)

    new_state = {
        "moments": jnp.stack([m1, m2], axis=-1),
        "history_len": hist_len,
    }
    return jnp.clip(filtered, 0.0, 1.0), new_state


_ATROUS_W = (1.0, 2.0 / 3.0, 1.0 / 6.0)   # 1D B-spline taps


def _atrous(img, var, view_z, normal, step: int):
    """One edge-aware a-trous step (shadow_denoise/spatial_filter.hlsl).
    Taps ride a stacked (9, H, W) axis (img.shift_stack) so the weight math
    is traced once instead of 9x (compile-size diet, round 4)."""
    sigma_l = jnp.sqrt(jnp.maximum(var, 1e-8)) * 3.0 + 1e-3
    offs = [(iy * step, ix * step) for iy in (-1, 0, 1) for ix in (-1, 0, 1)]
    wk = jnp.asarray([_ATROUS_W[abs(iy)] * _ATROUS_W[abs(ix)]
                      for iy in (-1, 0, 1) for ix in (-1, 0, 1)], jnp.float32)
    packed = jnp.concatenate([img[..., None], var[..., None],
                              view_z[..., None], normal], axis=-1)
    s = im.shift_stack(packed, offs)                 # (9, H, W, 6)
    v, vv, z, nn = s[..., 0], s[..., 1], s[..., 2], s[..., 3:6]
    w_z = jnp.exp(-jnp.abs(z - view_z) / (0.1 * view_z + 1e-4))
    w_n = jnp.maximum(jnp.sum(nn * normal, axis=-1), 0.0) ** 8
    w_l = jnp.exp(-jnp.abs(v - img) / sigma_l)
    w = wk[:, None, None] * w_z * w_n * w_l          # (9, H, W)
    acc = jnp.sum(v * w, axis=0)
    acc_v = jnp.sum(vv * w * w, axis=0)
    acc_w = jnp.sum(w, axis=0)
    inv = 1.0 / jnp.maximum(acc_w, 1e-8)
    return acc * inv, acc_v * inv * inv
