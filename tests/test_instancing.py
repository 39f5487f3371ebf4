"""True-instancing tests (reference: vulkan/ray_tracing.rs:171-275 BLAS/TLAS,
world_renderer.rs:604-858 instance tables).

Vertex/attribute tables are shared per unique mesh; instances add only
triangle index rows + one 3x4 transform. World corners and hit-time shading
must match a scene where the transforms were baked into the geometry.
"""
import jax.numpy as jnp
import numpy as np

from kajiya_tpu.scene import procedural
from kajiya_tpu.scene.mesh import Material, PackedMesh
from kajiya_tpu.scene.scene import Scene, build_gpu_scene
from kajiya_tpu.world import build_trace_scene, hit_attributes
from kajiya_tpu.rt.trace import scene_trace_closest


def _tri_mesh():
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm = np.tile(np.array([0, 0, 1], np.float32), (3, 1))
    return PackedMesh(
        positions=pos, normals=nrm,
        uvs=np.array([[0, 0], [1, 0], [0, 1]], np.float32),
        tangents=np.tile(np.array([1, 0, 0, 1], np.float32), (3, 1)),
        colors=np.ones((3, 4), np.float32),
        indices=np.array([[0, 1, 2]], np.uint32),
        material_ids=np.zeros(1, np.uint32),
        materials=[Material(base_color=np.array([0.5, 0.6, 0.7, 1], np.float32),
                            emissive=np.zeros(3, np.float32),
                            metallic=0.0, roughness=0.5)],
    )


def test_vertex_memory_is_o1_in_instances():
    """N instances of one mesh must NOT replicate the vertex tables."""
    mesh = _tri_mesh()
    for n in (1, 4, 16):
        sc = Scene()
        mid = sc.add_mesh(mesh)
        for i in range(n):
            sc.add_instance(mid, position=(2.0 * i, 0, 0))
        gpu = build_gpu_scene(sc, with_textures=False)
        assert gpu.verts_obj.shape[0] == mesh.num_vertices  # O(1) in n
        assert gpu.normals_obj.shape[0] == mesh.num_vertices
        assert gpu.tangents_obj.shape[0] == mesh.num_vertices
        assert gpu.uvs.shape[0] == mesh.num_vertices
        assert gpu.tri_idx.shape[0] == n  # triangles do replicate
        assert gpu.xforms.shape[0] == n


def _rot_y(deg):
    a = np.deg2rad(deg)
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def test_instanced_corners_match_baked():
    """World corners of mesh+transform == the same geometry baked."""
    mesh = _tri_mesh()
    rot = _rot_y(37.0)
    pos = np.array([1.5, -0.25, 2.0], np.float32)

    sc = Scene()
    mid = sc.add_mesh(mesh)
    sc.add_instance(mid)                       # identity
    sc.add_instance(mid, position=pos, rotation=rot)
    gpu = build_gpu_scene(sc, with_textures=False)
    v0, e1, e2 = (np.asarray(t) for t in gpu.triangle_corners())

    baked = mesh.positions @ rot.T + pos
    assert np.allclose(v0[0], mesh.positions[0], atol=1e-6)
    assert np.allclose(v0[1], baked[0], atol=1e-5)
    assert np.allclose(v0[1] + e1[1], baked[1], atol=1e-5)
    assert np.allclose(v0[1] + e2[1], baked[2], atol=1e-5)


def test_instanced_hit_shading_rotates_normals():
    """Shading normals/tangents come out of hit_attributes in WORLD space:
    an instance rotated 90 deg about Y must report a rotated normal."""
    mesh = _tri_mesh()
    rot = _rot_y(90.0)

    sc = Scene()
    mid = sc.add_mesh(mesh)
    sc.add_instance(mid)
    sc.add_instance(mid, position=(5.0, 0.0, 0.0), rotation=rot)
    gpu = build_gpu_scene(sc, with_textures=False)
    ts, levels = build_trace_scene(gpu)

    # ray 0 hits the identity instance head-on (-z dir); ray 1 hits the
    # rotated instance from +x (its normal now points along +x)
    org = jnp.array([[0.3, 0.3, 2.0], [7.0, 0.3, 0.0 - 0.3]], jnp.float32)
    dr = jnp.array([[0.0, 0.0, -1.0], [-1.0, 0.0, 0.0]], jnp.float32)
    hit = scene_trace_closest(ts, org, dr)
    assert bool(hit.hit_mask[0]) and bool(hit.hit_mask[1])
    at = hit_attributes(ts, hit, dr)
    n = np.asarray(at["normal"])
    assert np.allclose(n[0], [0, 0, 1], atol=1e-4)
    assert np.allclose(n[1], [1, 0, 0], atol=1e-4)
    # uv interpolation still reads the shared table
    assert np.isfinite(np.asarray(at["uv"])).all()
    # material/base color from the shared material row
    assert np.allclose(np.asarray(at["base_color"])[0], [0.5, 0.6, 0.7],
                       atol=1e-6)


def test_cornell_box_unchanged():
    """Single-instance scenes are bit-compatible with the old layout."""
    gpu = build_gpu_scene(procedural.cornell_box())
    assert gpu.num_triangles == 32
    v0, e1, e2 = (np.asarray(t) for t in gpu.triangle_corners())
    assert np.isfinite(v0).all() and np.isfinite(e1).all()
