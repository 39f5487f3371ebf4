"""WRC — world radiance cache: a grid of octahedral radiance probes.

Role of `renderers/wrc.rs:11-96` + `assets/shaders/wrc/*`: an 8x3x8 grid of
32^2 octahedral radiance probes traced by RT, packed in an atlas, with a
"see through" debug visualization. In the reference it is built but
DISABLED in the main graph (`world_render_passes.rs:101-111` allocates a
dummy); we match that status: available, off by default, bindable.

TPU design: the atlas is a (GX*GY*GZ, R, R, 3) probe array (one array, no
atlas addressing math); tracing all probe texels is one flat wavefront.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..sky.env import oct_decode, oct_encode


@dataclass(frozen=True)
class WrcConfig:
    grid: tuple = (8, 3, 8)         # wrc.rs probe grid dims
    probe_res: int = 32             # 32^2 octahedral probes (`wrc.rs:14`)
    grid_spacing: float = 2.0
    grid_origin: tuple = (-8.0, 0.5, -8.0)


def probe_centers(cfg: WrcConfig):
    gx, gy, gz = cfg.grid
    ii = jnp.stack(jnp.meshgrid(jnp.arange(gx), jnp.arange(gy),
                                jnp.arange(gz), indexing="ij"), -1)
    return (jnp.asarray(cfg.grid_origin)
            + ii.reshape(-1, 3).astype(jnp.float32) * cfg.grid_spacing)


def init_state(cfg: WrcConfig):
    n = cfg.grid[0] * cfg.grid[1] * cfg.grid[2]
    return {"wrc_atlas": jnp.zeros((n, cfg.probe_res, cfg.probe_res, 3),
                                   jnp.float32)}


def trace_wrc(state, ts, sky_env, diffuse_env, frame_idx, cfg: WrcConfig,
              max_trace_steps=None, hysteresis: float = 0.9):
    """Trace every probe texel ('wrc trace' pass) and blend into the atlas."""
    from ..rt.trace import scene_trace_closest
    from .hit_lighting import hit_radiance

    n = cfg.grid[0] * cfg.grid[1] * cfg.grid[2]
    r = cfg.probe_res
    centers = probe_centers(cfg)                      # (N, 3)

    uv = (jnp.stack(jnp.meshgrid(jnp.arange(r), jnp.arange(r),
                                 indexing="xy"), -1) + 0.5) / r
    dirs = oct_decode(uv.astype(jnp.float32)).reshape(-1, 3)   # (r*r, 3)

    org = jnp.repeat(centers, r * r, axis=0)          # (N*r*r, 3)
    d = jnp.tile(dirs, (n, 1))
    hit = scene_trace_closest(ts, org, d, t_min=1e-3,
                              max_steps=max_trace_steps)
    rad = hit_radiance(ts, hit, d, sky_env, diffuse_env,
                       max_trace_steps=max_trace_steps)
    new = rad.reshape(n, r, r, 3)
    atlas = state["wrc_atlas"] * hysteresis + new * (1.0 - hysteresis)
    return {"wrc_atlas": atlas}


def lookup(state, cfg: WrcConfig, pos, direction):
    """Radiance along `direction` from the probe nearest `pos` (the bindable
    interface every pass sees, `wrc.rs` BindToSimpleRenderPass)."""
    gx, gy, gz = cfg.grid
    rel = (pos - jnp.asarray(cfg.grid_origin)) / cfg.grid_spacing
    idx = jnp.round(rel).astype(jnp.int32)
    idx = jnp.clip(idx, 0, jnp.asarray([gx - 1, gy - 1, gz - 1]))
    flat = (idx[..., 0] * gy + idx[..., 1]) * gz + idx[..., 2]
    uv = oct_encode(direction)
    r = cfg.probe_res
    xi = jnp.clip((uv[..., 0] * r).astype(jnp.int32), 0, r - 1)
    yi = jnp.clip((uv[..., 1] * r).astype(jnp.int32), 0, r - 1)
    return state["wrc_atlas"][flat, yi, xi]


def see_through(state, cfg: WrcConfig, org, d, max_dist: float = 40.0,
                steps: int = 32):
    """Debug: raymarch the probe field ('wrc see through' pass,
    `wrc.rs:71-96`). Returns (R, 3) radiance approximation."""
    t = jnp.linspace(0.5, max_dist, steps)
    acc = jnp.zeros(org.shape[:-1] + (3,), jnp.float32)
    w = jnp.zeros(org.shape[:-1] + (1,), jnp.float32)
    for i in range(steps):
        p = org + d * t[i]
        s = lookup(state, cfg, p, d)
        take = (w[..., 0] < 1.0)[..., None]
        acc = acc + jnp.where(take, s * (1.0 / steps), 0.0)
        w = w + jnp.where(take, 1.0 / steps, 0.0)
    return acc
