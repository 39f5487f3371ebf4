"""World renderer state: trace-ready scene bundle + hit attribute fetch.

The TPU analog of `WorldRenderer`'s GPU tables + bindless access
(`world_renderer.rs:142-215`, `inc/mesh.hlsl`/`inc/bindless.hlsl`): one pytree
holding everything a trace/shade kernel needs, rebuilt (cheaply, in-jit) when
instance transforms change — the counterpart of the per-frame TLAS rebuild.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from .ops import smallvec as smv
from .rt.bvh import Bvh, bvh_from_scene, refit_bvh
from .scene.scene import GpuScene

# scenes at or below this many triangles use the MXU brute-force intersector
# (ops/woop.py) instead of BVH traversal — dense matmuls beat a divergent
# lockstep tree walk on TPU by orders of magnitude at this size
BRUTE_FORCE_MAX_TRIS = 8192
# up to this size, the brute intersector runs with per-chunk cluster culling
# (block AABBs + scalar-branch skipping — the stream-tracing formulation);
# only beyond it does the lockstep BVH walk take over
CULLED_BRUTE_MAX_TRIS = 262_144


@jax.tree_util.register_pytree_node_class
@dataclass
class TraceScene:
    """Everything needed to trace + shade: scene tables, BVH, world-space
    triangle SoA, vertex normals, and (small scenes) Woop brute-force
    transforms."""

    gpu: GpuScene
    bvh: Bvh
    v0: Any
    e1: Any
    e2: Any
    inst_rot: Any       # (I, 9) row-major rotation per instance (normals)
    light_v0: Any       # (L, 3) emissive triangle corners (world)
    light_e1: Any
    light_e2: Any
    light_area: Any     # (L,)
    light_emission: Any  # (L, 3)
    light_normal: Any = None   # (L, 3) unit normals (precomputed)
    woop: Any = None    # dict from ops.woop.build_woop, or None (BVH path)
    tri_attrs: Any = None   # (T, 35) consolidated per-triangle attributes
    vert_attrs: Any = None  # (V, 9) OBJECT-space normal(3) + uv(2) + tangent(4)

    _F = ("gpu", "bvh", "v0", "e1", "e2", "inst_rot",
          "light_v0", "light_e1", "light_e2", "light_area", "light_emission",
          "light_normal", "woop", "tri_attrs", "vert_attrs")

    def tree_flatten(self):
        return tuple(getattr(self, f) for f in self._F), None

    @classmethod
    def tree_unflatten(cls, _aux, ch):
        return cls(*ch)

    @property
    def tris(self):
        return (self.v0, self.e1, self.e2)


def build_trace_scene(gpu: GpuScene, leaf_size: int = 4,
                      brute_max_tris: int = CULLED_BRUTE_MAX_TRIS):
    """Host-side: build BVH topology + Morton permutation once; device
    arrays are produced eagerly on the CPU backend and shipped in one
    device_put (see inline note). Returns (TraceScene, levels) where levels
    is the opaque static bundle consumed by refresh_trace_scene."""
    import numpy as np

    use_brute = gpu.num_triangles <= brute_max_tris
    if use_brute and gpu.num_triangles > BRUTE_FORCE_MAX_TRIS:
        # Morton-sort the TRIANGLE TABLES THEMSELVES so spatially-compact
        # blocks are the canonical order (tight cluster culling with no
        # remap gather in the hot path)
        from .rt.bvh import morton3d

        v0, e1, e2 = (np.asarray(t) for t in gpu.triangle_corners())
        c = v0 + (e1 + e2) / 3.0
        lo, hi = c.min(axis=0), c.max(axis=0)
        norm = (c - lo) / np.maximum(hi - lo, 1e-12)
        perm = np.argsort(morton3d(norm), kind="stable").astype(np.int32)
        gpu = _permute_triangles(gpu, perm)

    bvh, lv, _tris = bvh_from_scene(gpu, leaf_size=leaf_size)
    levels = {"levels": lv, "use_brute": use_brute}
    # Build EAGERLY on the CPU backend: per-op eager dispatch through a
    # remote-TPU tunnel costs ~100ms/op (minutes for big scenes), and
    # jitting this build corrupts later dispatch in this jax build
    # ("Execution supplied N buffers but compiled program expected M" on
    # subsequent state-threaded calls). CPU eager is fast; one device_put
    # ships the finished bundle to the compute device.
    cpu = jax.devices("cpu")[0]
    gpu_c = jax.device_put(gpu, cpu)
    bvh_c = jax.device_put(bvh, cpu)
    with jax.default_device(cpu):
        ts = refresh_trace_scene(gpu_c, bvh_c, levels)
    dev = jax.devices()[0]
    if dev != cpu:
        ts = jax.device_put(ts, dev)
    else:
        ts = jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)), ts)
    return ts, levels


def _permute_triangles(gpu: GpuScene, perm: "np.ndarray") -> GpuScene:
    """Reorder every triangle-indexed table by `perm` (host-side, once)."""
    import numpy as np

    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=np.int32)
    lt = np.asarray(gpu.light_tri)
    lt2 = np.where(lt >= 0, inv[np.maximum(lt, 0)], -1).astype(np.int32)
    kw = {f: getattr(gpu, f) for f in gpu._FIELDS}
    kw.update(
        tri_idx=jnp.asarray(np.asarray(gpu.tri_idx)[perm]),
        tri_mat=jnp.asarray(np.asarray(gpu.tri_mat)[perm]),
        tri_inst=jnp.asarray(np.asarray(gpu.tri_inst)[perm]),
        light_tri=jnp.asarray(lt2),
    )
    return GpuScene(**kw)


def _tri_lod_constant(gpu: GpuScene, e1, e2):
    """(T,) 0.5 * log2(twice_uv_area / twice_world_area) per triangle — the
    geometry half of the ray-cone mip level (`inc/ray_cone.hlsl`,
    `gbuffer.rchit.hlsl:92`). Degenerate UVs fall back to 0 (such
    triangles sample mip ~log2(cone_width*size), still sane)."""
    uv = gpu.uvs[gpu.tri_idx]                               # (T, 3, 2)
    duv1 = uv[:, 1] - uv[:, 0]
    duv2 = uv[:, 2] - uv[:, 0]
    uv_area2 = jnp.abs(duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0])
    w_area2 = smv.norm3(jnp.cross(e1, e2))
    ok = (uv_area2 > 1e-20) & (w_area2 > 1e-20)
    return jnp.where(
        ok, 0.5 * jnp.log2(jnp.maximum(uv_area2, 1e-20)
                           / jnp.maximum(w_area2, 1e-20)), 0.0)


def refresh_trace_scene(gpu: GpuScene, bvh: Bvh, levels,
                        use_brute: bool | None = None) -> TraceScene:
    """Jit-safe: recompute world geometry + refit BVH for current transforms
    (the per-frame 'rebuild tlas' pass, `world_renderer.rs:865-911`).

    `levels` is either the raw refit schedule (legacy) or the static bundle
    from build_trace_scene ({"levels", "use_brute", "perm"})."""
    from .ops.woop import TRI_BLOCK, build_woop

    if isinstance(levels, dict):
        if use_brute is None:
            use_brute = levels.get("use_brute")
        levels = levels["levels"]

    v0, e1, e2 = gpu.triangle_corners()
    bvh = refit_bvh(bvh, levels, v0, e1, e2)
    if use_brute is None:
        use_brute = gpu.num_triangles <= CULLED_BRUTE_MAX_TRIS
    woop = None
    if use_brute:
        from .ops.woop import build_clusters

        # small scenes pad to 8 (VPU sublane) instead of a full matmul
        # block: the Pallas kernel is compute-bound in padded tris x rays
        if gpu.num_triangles <= TRI_BLOCK:
            pad = max(8, -(-gpu.num_triangles // 8) * 8)
        else:
            pad = -(-gpu.num_triangles // TRI_BLOCK) * TRI_BLOCK
        woop = build_woop(v0, e1, e2, pad_to=pad)
        if gpu.num_triangles > BRUTE_FORCE_MAX_TRIS:
            cmin, cmax = build_clusters(v0, e1, e2, pad_to=pad)
            woop["cmin"] = cmin
            woop["cmax"] = cmax
            # finer clusters for the Pallas streaming tracer (CULL_TB)
            from .ops.woop_pallas import CULL_TB

            c64min, c64max = build_clusters(v0, e1, e2, pad_to=pad,
                                            tri_block=CULL_TB)
            woop["cmin64"] = c64min
            woop["cmax64"] = c64max

    # consolidated attribute tables: one wide gather per hit instead of a
    # dozen narrow ones (ops/gather.py::gather_rows_multi rationale)
    mt = gpu.tri_mat
    # previous-frame corners ride the same wide row (velocity needs them;
    # widening the fetch is ~free vs separate per-pixel vertex gathers)
    v0p, e1p, e2p = gpu.triangle_corners(gpu.xforms_prev)
    # unit geometric normal precomputed PER TRIANGLE: the per-pixel
    # cross+normalize it replaces cost ~17 ms/frame at 1080p (three fused
    # re-reads of the wide attribute fetch)
    g_cross = jnp.cross(e1, e2)
    g_n = g_cross / jnp.maximum(smv.norm3(g_cross), 1e-12)[:, None]
    tri_attrs = jnp.concatenate([
        e1, e2, v0,
        gpu.mat_base_color[mt][:, :3],
        gpu.mat_metallic[mt][:, None],
        gpu.mat_roughness[mt][:, None],
        gpu.mat_emissive[mt],
        mt[:, None].astype(jnp.float32),
        e1p, e2p, v0p,
        g_n,
        gpu.tri_inst[:, None].astype(jnp.float32),
        # vertex ids as f32 (exact below 2^24): riding the wide row kills
        # the separate (R, 3) tri_idx gather + its column extractions
        # (~8 ms/frame at 1080p on the serial gather path)
        gpu.tri_idx.astype(jnp.float32),
        # ray-cone LOD triangle constant 0.5*log2(uv_area/world_area)
        # (`gbuffer.rchit.hlsl:92` lod_triangle_constant) — recomputed here
        # because world areas change with per-frame transforms
        _tri_lod_constant(gpu, e1, e2)[:, None],
    ], axis=-1)                                           # (T, 35)
    # vertex attributes stay OBJECT-space (shared across instances — true
    # instancing); hit_attributes rotates normals/tangents to world with
    # the per-hit instance rotation, the reference's object->world hit
    # shading (gbuffer.rchit.hlsl)
    vert_attrs = jnp.concatenate(
        [gpu.normals_obj, gpu.uvs, gpu.tangents_obj], axis=-1)   # (V, 9)
    inst_rot = gpu.instance_rotations().reshape(-1, 9)

    lt = jnp.maximum(gpu.light_tri, 0)
    lv0, le1, le2 = v0[lt], e1[lt], e2[lt]
    l_cross = jnp.cross(le1, le2)
    l_len = smv.norm3(l_cross)
    area = 0.5 * l_len
    l_normal = l_cross / jnp.maximum(l_len, 1e-12)[:, None]
    emission = gpu.mat_emissive[gpu.tri_mat[lt]]
    live = (gpu.light_tri >= 0)[:, None]
    return TraceScene(
        gpu=gpu, bvh=bvh, v0=v0, e1=e1, e2=e2, inst_rot=inst_rot,
        light_v0=lv0, light_e1=le1, light_e2=le2,
        light_area=jnp.where(live[:, 0], area, 0.0),
        light_emission=jnp.where(live, emission, 0.0),
        light_normal=l_normal,
        woop=woop, tri_attrs=tri_attrs, vert_attrs=vert_attrs,
    )


def hit_attributes(ts: TraceScene, hit, ray_dir, mip: int = 0,
                   no_normal_maps: bool = False,
                   full_shading: bool = True,
                   with_prev_pos: bool = False,
                   cone_width=None):
    """Fetch shading attributes at hit points (the software `gbuffer.rchit`,
    cf. `assets/shaders/rt/gbuffer.rchit.hlsl`). All entries are safe for
    missed rays (mask with hit.hit_mask). Returns a dict of (R, ...) arrays.

    `cone_width`: per-ray footprint width at the hit (ray-cone LOD,
    `inc/ray_cone.hlsl` + `gbuffer.rchit.hlsl:29-44`): the texture mip is
    derived from the pixel footprint projected into texel space —
    lambda = tri_constant + log2(cone_width) - log2(|dot(dir, geo_n)|)
    (+ log2(texture_size) inside sample_pages). Falls back to the static
    `mip` when None (primary rays 0; legacy secondary call sites 2).

    Internals are LANE-MAJOR (C, R): the attribute fetch lands as (31, R)
    dense rows (ops/gather.py::fetch_rows_t — small scenes skip the serial
    gather via a fused one-hot MXU matmul) and all math stays in (3, R)
    planes; outputs transpose to the (R, C) convention at the end, which
    XLA lowers to (R, C){0,1} — physically the same dense layout."""
    from .ops.gather import fetch_rows_t, interp3_rows_t, take_rows

    gpu = ts.gpu
    tri = jnp.maximum(hit.tri, 0)
    ta = fetch_rows_t(ts.tri_attrs, tri)                    # (31, R)
    e1_t, e2_t, v0_t = ta[0:3], ta[3:6], ta[6:9]
    base_color = ta[9:12]
    metallic = ta[12]
    roughness = ta[13]
    emissive = ta[14:17]
    mat = jnp.round(ta[17]).astype(jnp.int32)

    u_l, v_l = hit.u[None, :], hit.v[None, :]
    rd_t = ray_dir.T                                        # (3, R)

    def dot3_l(a, b):
        return (a * b).sum(axis=0, keepdims=True)           # (1, R)

    # geometric normal: fetched per-triangle (precomputed unit), oriented
    # against the incoming ray (double-sided materials)
    geo_n = ta[27:30]
    flip = jnp.sign(-dot3_l(geo_n, rd_t))
    flip = jnp.where(flip == 0.0, 1.0, flip)
    geo_n = geo_n * flip

    w = 1.0 - hit.u - hit.v
    if full_shading:
        # interpolated vertex attributes: ONE three-hot weighted matmul on
        # small scenes (gather + barycentric lerp fused); three wide
        # gathers beyond ONEHOT_T_MAX. Secondary rays may pass
        # full_shading=False and shade with the face normal — the tradeoff
        # is chosen by `RenderConfig.secondary_full_shading` (default True
        # = the reference's gbuffer.rchit behavior).
        # vertex ids ride the wide tri_attrs row (see refresh_trace_scene)
        idx0 = jnp.round(ta[31]).astype(jnp.int32)
        idx1 = jnp.round(ta[32]).astype(jnp.int32)
        idx2 = jnp.round(ta[33]).astype(jnp.int32)
        va = interp3_rows_t(ts.vert_attrs, idx0, idx1, idx2,
                            w, hit.u, hit.v)                # (9, R)
        # vertex attrs are OBJECT-space (shared across instances): rotate
        # by the hit instance's rotation — a tiny one-hot fetch of the
        # (I, 9) rotation table + 9 fused FMAs per lane
        inst = jnp.round(ta[30]).astype(jnp.int32)
        rot = fetch_rows_t(ts.inst_rot, inst)               # (9, R)

        def rot3_l(v):
            return jnp.concatenate([
                rot[0:1] * v[0:1] + rot[1:2] * v[1:2] + rot[2:3] * v[2:3],
                rot[3:4] * v[0:1] + rot[4:5] * v[1:2] + rot[5:6] * v[2:3],
                rot[6:7] * v[0:1] + rot[7:8] * v[1:2] + rot[8:9] * v[2:3],
            ], axis=0)

        nrm = rot3_l(va[0:3])
        nrm = nrm / jnp.maximum(jnp.sqrt(dot3_l(nrm, nrm)), 1e-12)
        normal = jnp.where(dot3_l(nrm, geo_n) < 0.0, -nrm, nrm)
        uv = va[3:5].T
        tangent = rot3_l(va[5:8])
        tan_w = va[8]
    else:
        normal = geo_n
        uv = jnp.zeros((tri.shape[0], 2), jnp.float32)
        tangent = None
        tan_w = None

    pos = v0_t + e1_t * u_l + e2_t * v_l                    # (3, R)

    if gpu.tex_pages is not None and full_shading:
        # manual texture fetch (bindless sampling equivalent; gltf packs
        # roughness in G and metalness in B of the MR map)
        from .scene.textures import sample_pages

        lod_base = None
        if cone_width is not None:
            cos_in = jnp.abs(dot3_l(geo_n, rd_t))[0]        # (R,)
            lod_base = (ta[34]
                        + jnp.log2(jnp.maximum(jnp.abs(cone_width), 1e-12))
                        - jnp.log2(jnp.clip(cos_in, 1e-2, 1.0)))

        slots = gpu.mat_tex[mat]                      # (R, 4)
        # per-slot color space (TexGamma::{Srgb,Linear} in kajiya-asset):
        # base color + emissive are sRGB; MR + normal maps are linear data
        bc = sample_pages(gpu.tex_pages, gpu.page_sub, slots[:, 0], uv,
                          mip=mip, srgb=True, lod_base=lod_base)
        mr = sample_pages(gpu.tex_pages, gpu.page_sub, slots[:, 1], uv,
                          mip=mip, nearest=True, lod_base=lod_base)
        em = sample_pages(gpu.tex_pages, gpu.page_sub, slots[:, 3], uv,
                          mip=mip, nearest=True, srgb=True,
                          lod_base=lod_base)
        base_color = base_color * bc[:, :3].T
        roughness = jnp.clip(roughness * mr[:, 1], 1e-3, 1.0)
        metallic = jnp.clip(metallic * mr[:, 2], 0.0, 1.0)
        emissive = emissive * em[:, :3].T
        # tangent-space normal mapping (the reference applies material
        # normal maps via the vertex TBN; lanes without a normal texture or
        # tangents keep the interpolated normal)
        nm = sample_pages(gpu.tex_pages, gpu.page_sub, slots[:, 2], uv,
                          mip=mip, nearest=True, lod_base=lod_base)
        tnorm = nm[:, :3].T * 2.0 - 1.0                # (3, R)
        t_len = jnp.sqrt(dot3_l(tangent, tangent))     # (1, R)
        t_ok = (t_len[0] > 1e-4) & (slots[:, 2] > 0)
        t = tangent / jnp.maximum(t_len, 1e-8)
        # cross(normal, t) in lane-major components
        b = jnp.concatenate([
            normal[1:2] * t[2:3] - normal[2:3] * t[1:2],
            normal[2:3] * t[0:1] - normal[0:1] * t[2:3],
            normal[0:1] * t[1:2] - normal[1:2] * t[0:1]], axis=0)
        b = b * tan_w[None, :]
        n_mapped = t * tnorm[0:1] + b * tnorm[1:2] + normal * tnorm[2:3]
        n_mapped = n_mapped / jnp.maximum(
            jnp.sqrt(dot3_l(n_mapped, n_mapped)), 1e-12)
        if not no_normal_maps:      # RenderOverrides.no_normal_maps
            normal = jnp.where(t_ok[None, :], n_mapped, normal)

    out = dict(
        pos=pos.T,
        normal=normal.T,
        geo_normal=geo_n.T,
        uv=uv,
        base_color=base_color.T,
        metallic=metallic,
        roughness=roughness,
        emissive=emissive.T,
        material=mat,
    )
    if with_prev_pos:
        e1p, e2p, v0p = ta[18:21], ta[21:24], ta[24:27]
        out["pos_prev"] = (v0p + e1p * u_l + e2p * v_l).T
    return out
