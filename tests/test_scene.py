"""Scene layer tests: RON parsing, procedural scenes, glTF import, GpuScene."""
import os

import numpy as np
import pytest

from kajiya_tpu.scene import procedural, ron
from kajiya_tpu.scene.scene import build_gpu_scene

REF_ASSETS = "/root/reference/assets"


class TestRon:
    def test_scene_format(self):
        doc = ron.loads("""
        (
            instances: [
                (
                    position: (0, -1, 0),
                    mesh: "/meshes/cornell_box/scene.gltf",
                    scale: (2, 2, 2),
                ),
            ]
        )
        """)
        assert len(doc["instances"]) == 1
        inst = doc["instances"][0]
        assert inst["position"] == (0, -1, 0)
        assert inst["mesh"] == "/meshes/cornell_box/scene.gltf"
        assert inst["scale"] == (2, 2, 2)

    def test_nested_and_bools(self):
        doc = ron.loads('( a: true, b: [1, 2.5, "x"], c: ( d: -3 ) )')
        assert doc == {"a": True, "b": [1, 2.5, "x"], "c": {"d": -3}}


class TestProcedural:
    def test_cornell_box_builds(self):
        scene = procedural.cornell_box()
        gpu = build_gpu_scene(scene)
        assert gpu.num_triangles == 32
        assert int(gpu.num_lights) == 2  # the 2 light-quad triangles
        v0, e1, e2 = (np.asarray(t) for t in gpu.triangle_corners())
        corners = np.concatenate([v0, v0 + e1, v0 + e2])
        assert corners.min() >= -1.001 and corners.max() <= 1.001

    def test_world_positions_transform(self):
        scene = procedural.single_triangle()
        scene.instances[0].position = np.array([5, 0, 0], np.float32)
        gpu = build_gpu_scene(scene)
        v0, e1, e2 = (np.asarray(t) for t in gpu.triangle_corners())
        assert np.allclose(v0[:, 0].mean(), 5.0, atol=1.0)

    def test_triangle_corners(self):
        gpu = build_gpu_scene(procedural.single_triangle())
        v0, e1, e2 = gpu.triangle_corners()
        assert v0.shape == (1, 3)
        n = np.cross(np.asarray(e1[0]), np.asarray(e2[0]))
        assert np.allclose(n / np.linalg.norm(n), [0, 0, 1])


@pytest.mark.skipif(not os.path.isdir(REF_ASSETS), reason="reference assets not mounted")
class TestGltf:
    def test_cornell_gltf(self):
        from kajiya_tpu.scene.mesh import load_gltf_mesh

        mesh = load_gltf_mesh(os.path.join(REF_ASSETS, "meshes/cornell_box/scene.gltf"))
        assert mesh.num_triangles > 10
        assert len(mesh.materials) == 8
        # normals unit-length
        assert np.allclose(np.linalg.norm(mesh.normals, axis=-1), 1.0, atol=1e-3)
        # the bundled cornell asset carries NO emissiveFactor on its "light"
        # material (the viewer adds emission at runtime) — just check the
        # materials parsed with distinct base colors
        base = np.stack([m.base_color for m in mesh.materials])
        assert len(np.unique(base.round(3), axis=0)) > 2

    def test_ron_scene_load(self):
        from kajiya_tpu.scene.scene import load_ron_scene

        scene = load_ron_scene(os.path.join(REF_ASSETS, "scenes/cornell_box.ron"))
        assert len(scene.instances) == 1
        assert np.allclose(scene.instances[0].scale, [2, 2, 2])
        gpu = build_gpu_scene(scene)
        assert gpu.num_triangles > 10


def test_city_scene_instancing():
    """Battle-scale stand-in generator: true instancing (one building mesh
    per material, shared vertex tables) and grid-proportional tri counts."""
    from kajiya_tpu.scene.procedural import city

    scene = city(n=3, subdiv=2)
    assert len(scene.instances) == 3 * 3 + 1
    gpu = build_gpu_scene(scene, with_textures=False)
    # 9 buildings x 6*2*2*2 tris + 2 ground tris
    assert gpu.num_triangles == 9 * 48 + 2
    # vertex tables are per-mesh, not per-instance: 3 material clones of
    # the building (6 faces x 9 verts) + 4 ground verts
    assert gpu.verts_obj.shape[0] == 3 * 6 * 9 + 4
    # every building instance references one of the three shared meshes
    assert int(gpu.tri_inst.max()) == 9
