"""Scene = meshes + instances + sun/sky; host side of `WorldRenderer`'s tables.

Mirrors the reference's scene model (`world_renderer.rs:153-167,604-858`):
meshes are added once, instances reference a mesh with a transform, and
emissive triangles become explicit lights (`world_renderer.rs:741-773`).

The GPU-facing product is `GpuScene`: fixed-shape jnp arrays. TRUE INSTANCING
(the BLAS/TLAS split of `vulkan/ray_tracing.rs:171-275`): vertex/attribute
tables are stored ONCE per unique mesh (object space) — N instances of a mesh
cost O(1) vertex memory. Only the per-TRIANGLE index tables (tri_idx /
tri_mat / tri_inst, 3 int32s each) replicate per instance, referencing the
shared vertex block plus a per-instance 3x4 transform. World-space triangle
corners are recomputed inside the jitted frame with a per-corner transform
(`triangle_corners`) so animated transforms just work and the BVH can be
refit per frame — the analog of the reference's per-frame TLAS rebuild
(`world_renderer.rs:865-911`) done the XLA way; shading normals/tangents stay
object-space and are rotated at hit time (the reference's object->world hit
shading, `gbuffer.rchit.hlsl`).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import PackedMesh, load_gltf_mesh


@dataclass
class Instance:
    mesh_id: int
    position: np.ndarray
    rotation: np.ndarray  # 3x3
    scale: np.ndarray     # (3,)

    def transform(self) -> np.ndarray:
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = self.rotation * self.scale[None, :]
        m[:3, 3] = self.position
        return m


@dataclass
class Scene:
    meshes: list = field(default_factory=list)      # list[PackedMesh]
    instances: list = field(default_factory=list)   # list[Instance]
    sun_direction: np.ndarray = field(default_factory=lambda: np.array([0.35, 0.8, 0.5], np.float32))
    sun_color: np.ndarray = field(default_factory=lambda: np.array([1.0, 1.0, 1.0], np.float32))
    sun_intensity: float = 20.0
    sun_angular_radius: float = 0.0093  # ~0.53 deg solar disk, cf. sun.rs defaults
    emissive_multiplier: float = 1.0

    def add_mesh(self, mesh: PackedMesh) -> int:
        self.meshes.append(mesh)
        return len(self.meshes) - 1

    def add_instance(self, mesh_id: int, position=(0, 0, 0), rotation=None, scale=(1, 1, 1)) -> int:
        rot = np.eye(3, dtype=np.float32) if rotation is None else np.asarray(rotation, np.float32)
        self.instances.append(Instance(
            mesh_id=mesh_id,
            position=np.asarray(position, np.float32),
            rotation=rot,
            scale=np.asarray(scale, np.float32),
        ))
        return len(self.instances) - 1


# ----------------------------------------------------------------------------
# GPU scene: fixed-shape array bundle (a pytree)
# ----------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclass
class GpuScene:
    """All per-scene device arrays. Geometry is object-space; transforms are
    per-instance and may be updated every frame without rebuilding."""

    verts_obj: Any        # (V, 3) f32 object-space positions (per UNIQUE mesh)
    normals_obj: Any      # (V, 3) f32 object-space normals
    tangents_obj: Any     # (V, 4) f32 object-space tangent + handedness w
    uvs: Any              # (V, 2) f32
    tri_idx: Any          # (T, 3) i32 indices into the shared vertex block
    tri_mat: Any          # (T,) i32 material id (global table)
    tri_inst: Any         # (T,) i32 instance id
    xforms: Any           # (I, 3, 4) f32 current object->world
    xforms_prev: Any      # (I, 3, 4) f32 previous frame
    mat_base_color: Any   # (M, 4) f32
    mat_emissive: Any     # (M, 3) f32
    mat_metallic: Any     # (M,) f32
    mat_roughness: Any    # (M,) f32
    light_tri: Any        # (L,) i32 triangle ids of emissive tris (padded w/ -1)
    num_lights: Any       # () i32
    sun_direction: Any    # (3,) f32 (normalized, towards the sun)
    sun_radiance: Any     # (3,) f32
    sun_angular_radius: Any  # () f32
    tex_pages: Any = None    # (N, s, s + s//2, 4) uint8 mip atlas, or None
    mat_tex: Any = None      # (M, 4) i32 page ids [base, mr, normal, emissive]
    page_sub: Any = None     # (P, 4) i32 [page, size, ox, oy] subregion table

    _FIELDS = (
        "verts_obj", "normals_obj", "tangents_obj", "uvs", "tri_idx", "tri_mat",
        "tri_inst", "xforms", "xforms_prev", "mat_base_color", "mat_emissive",
        "mat_metallic", "mat_roughness", "light_tri", "num_lights",
        "sun_direction", "sun_radiance", "sun_angular_radius",
        "tex_pages", "mat_tex", "page_sub",
    )

    def tree_flatten(self):
        return tuple(getattr(self, f) for f in self._FIELDS), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)

    @property
    def num_triangles(self):
        return self.tri_idx.shape[0]

    def triangle_corners(self, xforms=None):
        """(v0, e1, e2): (T, 3) world-space Moller-Trumbore corners under the
        given transforms (default current). Vertices are SHARED across
        instances, so the object->world transform applies per triangle corner
        (the instance step of the reference's TLAS, `ray_tracing.rs:171-275`)
        — batched FMAs, no per-instance vertex copies."""
        xf = (self.xforms if xforms is None else xforms)[self.tri_inst]
        rot, trans = xf[:, :, :3], xf[:, :, 3]

        def tf(p):
            return jnp.einsum("tij,tj->ti", rot, p) + trans

        v0 = tf(self.verts_obj[self.tri_idx[:, 0]])
        v1 = tf(self.verts_obj[self.tri_idx[:, 1]])
        v2 = tf(self.verts_obj[self.tri_idx[:, 2]])
        return v0, v1 - v0, v2 - v0

    def instance_rotations(self):
        """(I, 3, 3) orthonormalized rotation part of each transform, for
        rotating object-space shading normals/tangents to world at hit time
        (column-normalized — exact for rotation + uniform scale, matching
        the reference's normal handling)."""
        r = self.xforms[:, :, :3]
        n = jnp.maximum(jnp.sqrt((r * r).sum(axis=1, keepdims=True)), 1e-12)
        return r / n


def build_gpu_scene(scene: Scene, max_lights: int = 4096,
                    with_textures: bool = True) -> GpuScene:
    """Flatten host Scene into a GpuScene.

    The tables are committed to the CPU backend; `build_trace_scene` ships
    the finished bundle to the accelerator in one device_put. Keeping every
    host-side build step off the TPU matters doubly here: per-op eager
    dispatch through the remote-TPU tunnel is slow, and ANY device->host
    readback from the TPU permanently drops the session into a synchronous
    ~41 ms/dispatch mode (measured; see ops/smallvec.py for the op-level
    pathologies)."""
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        return _build_gpu_scene(scene, max_lights, with_textures)


def _build_gpu_scene(scene: Scene, max_lights: int = 4096,
                     with_textures: bool = True) -> GpuScene:
    tri_idx, tri_mat, tri_inst = [], [], []
    materials = []
    mesh_mat_offset = []
    mesh_voff = []
    voff = 0
    # global texture page table: dedupe image sources across meshes
    # (the bindless image registry, `world_renderer.rs:541-602`)
    img_src, img_slot = [], {}
    mat_tex_rows = []
    for mesh in scene.meshes:
        mesh_mat_offset.append(len(materials))
        mesh_voff.append(voff)
        voff += mesh.num_vertices
        materials.extend(mesh.materials)
        paths = getattr(mesh, "image_paths", [])
        for m in mesh.materials:
            row = []
            for ti in (m.base_color_texture, m.mr_texture,
                       m.normal_texture, m.emissive_texture):
                if with_textures and 0 <= ti < len(paths):
                    src = paths[ti]
                    if src not in img_slot:
                        img_slot[src] = len(img_src) + 1  # 0 = white page
                        img_src.append(src)
                    row.append(img_slot[src])
                else:
                    row.append(0)
            mat_tex_rows.append(row)

    # vertex/attribute tables once per UNIQUE mesh (the BLAS analog);
    # per-instance cost is 3 int32 triangle tables + one 3x4 transform
    verts = np.concatenate([m.positions for m in scene.meshes])
    normals = [m.normals for m in scene.meshes]
    tangents = [m.tangents for m in scene.meshes]
    uvs = [m.uvs for m in scene.meshes]

    for inst_id, inst in enumerate(scene.instances):
        mesh = scene.meshes[inst.mesh_id]
        tri_idx.append(mesh.indices.astype(np.int64) + mesh_voff[inst.mesh_id])
        tri_mat.append(mesh.material_ids.astype(np.int64) + mesh_mat_offset[inst.mesh_id])
        tri_inst.append(np.full(mesh.num_triangles, inst_id, np.int32))

    tri_idx = np.concatenate(tri_idx).astype(np.int32)
    tri_mat = np.concatenate(tri_mat).astype(np.int32)

    xf = np.stack([inst.transform()[:3, :] for inst in scene.instances]).astype(np.float32)

    mat_base = np.stack([m.base_color for m in materials]).astype(np.float32)
    mat_emis = np.stack([m.emissive for m in materials]).astype(np.float32) * scene.emissive_multiplier
    mat_metal = np.array([m.metallic for m in materials], np.float32)
    mat_rough = np.array([m.roughness for m in materials], np.float32)

    # Emissive triangle lights (cf. `world_renderer.rs:741-773`). Padded to
    # the ACTUAL count rounded up to 8, not the max_lights cap: the light
    # table rides per-ray NEE fetches (a one-hot MXU gather when small,
    # lights.py) and (R, L) membership compares, both of which scale with
    # the pad. Shapes are already scene-dependent, so this costs nothing.
    is_emissive = (mat_emis[tri_mat] > 0).any(axis=-1)
    light_ids = np.nonzero(is_emissive)[0].astype(np.int32)
    n_lights = min(len(light_ids), max_lights)
    pad_l = max(8, -(-n_lights // 8) * 8)
    light_tri = np.full(pad_l, -1, np.int32)
    light_tri[:n_lights] = light_ids[:n_lights]

    sun_dir = scene.sun_direction / np.linalg.norm(scene.sun_direction)

    tex_pages = None
    mat_tex = None
    page_sub = None
    if with_textures and img_src:
        from .textures import build_texture_pages

        tex_pages, page_sub = build_texture_pages(img_src)
        mat_tex = jnp.asarray(np.asarray(mat_tex_rows, np.int32))

    return GpuScene(
        tex_pages=tex_pages,
        mat_tex=mat_tex,
        page_sub=page_sub,
        verts_obj=jnp.asarray(verts, jnp.float32),
        normals_obj=jnp.asarray(np.concatenate(normals), jnp.float32),
        tangents_obj=jnp.asarray(np.concatenate(tangents), jnp.float32),
        uvs=jnp.asarray(np.concatenate(uvs), jnp.float32),
        tri_idx=jnp.asarray(tri_idx),
        tri_mat=jnp.asarray(tri_mat),
        tri_inst=jnp.asarray(np.concatenate(tri_inst), jnp.int32),
        xforms=jnp.asarray(xf),
        xforms_prev=jnp.asarray(xf),
        mat_base_color=jnp.asarray(mat_base),
        mat_emissive=jnp.asarray(mat_emis),
        mat_metallic=jnp.asarray(mat_metal),
        mat_roughness=jnp.asarray(mat_rough),
        light_tri=jnp.asarray(light_tri),
        num_lights=jnp.asarray(n_lights, jnp.int32),
        sun_direction=jnp.asarray(sun_dir, jnp.float32),
        sun_radiance=jnp.asarray(scene.sun_color * scene.sun_intensity, jnp.float32),
        sun_angular_radius=jnp.asarray(scene.sun_angular_radius, jnp.float32),
    )


# ----------------------------------------------------------------------------
# RON scene loading (`view` app parity: `scene.rs:1-19`)
# ----------------------------------------------------------------------------

def load_ron_scene(path: str, asset_root: str | None = None) -> Scene:
    """Load a kajiya RON scene. Mesh paths like "/meshes/x/scene.gltf" resolve
    against `asset_root` (defaults to the directory two levels up from the .ron,
    i.e. the assets/ dir)."""
    from . import ron

    doc = ron.load(path)
    if asset_root is None:
        asset_root = os.path.dirname(os.path.dirname(os.path.abspath(path)))
    scene = Scene()
    mesh_cache = {}
    for inst in doc.get("instances", []):
        mesh_path = inst["mesh"]
        full = os.path.join(asset_root, mesh_path.lstrip("/"))
        if full not in mesh_cache:
            mesh_cache[full] = scene.add_mesh(load_gltf_mesh(full))
        rot = np.eye(3, dtype=np.float32)
        if "rotation" in inst:
            from .gltf import _quat_to_mat3
            q = inst["rotation"]
            rot = _quat_to_mat3(q[0], q[1], q[2], q[3])
        scene.add_instance(
            mesh_cache[full],
            position=np.asarray(inst.get("position", (0, 0, 0)), np.float32),
            rotation=rot,
            scale=np.asarray(inst.get("scale", (1, 1, 1)), np.float32),
        )
    return scene
