"""G-buffer generation by primary-ray visibility.

Role of the reference's raster pass (`renderers/raster_meshes.rs:28-178`,
`raster_simple_vs/ps.hlsl`) + gbuffer packing (`inc/gbuffer.hlsl:51-60`).
On TPU the idiomatic "raster" of a fully ray-traced engine is a primary
visibility trace: one camera ray per pixel through the same BVH used by every
other pass — no divergence, perfectly coherent rays, and it unifies the
"RTX on" pipeline. Outputs stay UNPACKED as planar f32 arrays (dense SoA is
the TPU analog of the packed RGBA32 gbuffer; bit-packing would only cost VPU
ops here since HBM stores are already minimal per plane).

Velocity is computed exactly like `raster_simple_vs.hlsl`: current and
previous world positions of the same surface point under the instance's
current/previous transforms, projected with the respective view matrices.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.camera import ViewConstants, camera_rays
from ..rt.trace import scene_trace_closest
from ..world import TraceScene, hit_attributes


def _project(m, p):
    """(4,4) @ (..., 3) homogeneous -> clip (..., 4)."""
    from ..ops.smallvec import matvec

    return matvec(m[:, :3], p) + m[:, 3]


def raytrace_gbuffer(ts: TraceScene, view: ViewConstants, width: int, height: int,
                     max_trace_steps=None, no_normal_maps: bool = False):
    """Trace primary rays -> gbuffer dict of (H, W[, C]) planes.

    Keys: depth (reversed-inf-Z; 0 = sky), normal, geo_normal, albedo,
    metallic, roughness, emissive, velocity (uv delta cur->prev), pos (world),
    hit (bool), ray_dir.
    """
    org, d = camera_rays(view, width, height)
    tiled = ts.woop is not None and "cmin" in ts.woop
    if tiled:
        # compact 2D tiles -> narrow chunk frustums -> tight cluster culling
        from ..ops.tiling import tile_order, untile_order

        orgf = tile_order(org).reshape(-1, 3)
        df = tile_order(d).reshape(-1, 3)
    else:
        orgf = org.reshape(-1, 3)
        df = d.reshape(-1, 3)
    hit = scene_trace_closest(ts, orgf, df, max_steps=max_trace_steps)
    if tiled:
        import jax

        hit = jax.tree_util.tree_map(
            lambda x: untile_order(x, height, width).reshape(-1), hit)
        df = d.reshape(-1, 3)
    return gbuffer_from_hit(ts, view, hit, df, width, height,
                            no_normal_maps=no_normal_maps)


def raster_gbuffer(ts: TraceScene, view: ViewConstants, width: int,
                   height: int, max_trace_steps=None,
                   no_normal_maps: bool = False):
    """Rasterized primary visibility ("raster simple" / RTX-off mode,
    `raster_meshes.rs:28-178`): exact screen-rect binned visibility
    (renderers/raster.py) feeding the SAME gbuffer planes — bit-identical
    hits to `raytrace_gbuffer`, tighter per-tile work on large scenes."""
    from .raster import raster_hit

    _, d = camera_rays(view, width, height)
    hit = raster_hit(ts, view, width, height, max_trace_steps=max_trace_steps)
    return gbuffer_from_hit(ts, view, hit, d.reshape(-1, 3), width, height,
                            no_normal_maps=no_normal_maps)


def gbuffer_from_hit(ts: TraceScene, view: ViewConstants, hit, df,
                     width: int, height: int, no_normal_maps: bool = False):
    """Shared attribute interpolation + packing: per-pixel Hit -> gbuffer
    dict (the `raster_simple_ps.hlsl` / gbuffer-packing half of the pass).
    hit/df are flat row-major over (height, width) pixels."""
    # primary ray cone: width grows linearly with hit distance at the
    # per-pixel spread angle ~ 2*tan(fov_y/2)/H (ray_cone.hlsl /
    # `pixel_cone_spread_angle_from_image_height`); view_to_clip[1,1] is
    # 1/tan(fov_y/2). Drives the footprint-derived texture mip.
    # The 0.3x shrink matches the reference PT's isotropic-cone
    # compensation (`reference_path_trace.rgen.hlsl:128` "0.3 is a fudge
    # factor"): a full isotropic cone picks the GRAZING-axis footprint and
    # greys out minified textures the reference's anisotropic raster
    # sampler keeps (measured: textured-cornell floor chroma 0.14 vs the
    # oracle's 0.32 at 64x48); the residual under-filtering aliases into
    # exactly what TAA integrates.
    spread = 0.3 * 2.0 / (view.view_to_clip[1, 1] * height)
    cone_w = spread * jnp.where(hit.hit_mask, hit.t, 0.0)
    attrs = hit_attributes(ts, hit, df, no_normal_maps=no_normal_maps,
                           with_prev_pos=True, cone_width=cone_w)

    m = hit.hit_mask
    pos = attrs["pos"]

    # reversed-infinite-Z depth from view-space z (camera.rs:89-126 convention)
    vpos = _project(view.world_to_view, pos)[..., :3]
    near = view.view_to_clip[2, 3]
    depth = jnp.where(m, near / jnp.maximum(-vpos[..., 2], 1e-8), 0.0)

    # velocity: the previous-frame surface point interpolates the
    # prev-frame triangle corners carried in tri_attrs — zero extra
    # gathers (raster_simple_vs.hlsl behavior, prev transform folded in)
    world_prev = attrs["pos_prev"]

    clip_cur = _project(view.world_to_clip, pos)
    clip_prev = _project(view.world_to_clip_prev, world_prev)
    ndc_cur = clip_cur[..., :2] / jnp.maximum(clip_cur[..., 3:4], 1e-8)
    ndc_prev = clip_prev[..., :2] / jnp.maximum(clip_prev[..., 3:4], 1e-8)
    # ndc (+Y up) -> uv (origin top-left): u = 0.5 + x/2, v = 0.5 - y/2
    uv_cur = jnp.stack([0.5 + 0.5 * ndc_cur[..., 0], 0.5 - 0.5 * ndc_cur[..., 1]], -1)
    uv_prev = jnp.stack([0.5 + 0.5 * ndc_prev[..., 0], 0.5 - 0.5 * ndc_prev[..., 1]], -1)
    velocity = jnp.where(m[:, None], uv_prev - uv_cur, 0.0)

    def r(x):
        return x.reshape((height, width) + x.shape[1:])

    return {
        "depth": r(depth),
        "normal": r(jnp.where(m[:, None], attrs["normal"], 0.0)),
        "geo_normal": r(jnp.where(m[:, None], attrs["geo_normal"], 0.0)),
        "albedo": r(jnp.where(m[:, None], attrs["base_color"], 0.0)),
        "metallic": r(jnp.where(m, attrs["metallic"], 0.0)),
        "roughness": r(jnp.where(m, attrs["roughness"], 1.0)),
        "emissive": r(jnp.where(m[:, None], attrs["emissive"], 0.0)),
        "velocity": r(velocity),
        "pos": r(jnp.where(m[:, None], pos, 0.0)),
        "hit": r(m),
        "ray_dir": r(df),
    }


def gbuffer_view_z(gb, near: float = 0.01):
    """Positive view-space distance; large for sky."""
    return jnp.where(gb["hit"], near / jnp.maximum(gb["depth"], 1e-12), 1e8)
