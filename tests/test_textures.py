"""Texture pages: decode, mips, sampling, gbuffer integration."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from kajiya_tpu.scene.textures import (PAGE_SIZE, build_texture_pages,
                                       sample_pages)

REF_ASSETS = "/root/reference/assets"


class TestPages:
    def test_white_page_default(self):
        pages = build_texture_pages([])
        assert pages[0].shape == (1, PAGE_SIZE, PAGE_SIZE, 4)
        assert float(pages[0].min()) == 1.0
        assert len(pages) == 5
        assert pages[-1].shape[1] == PAGE_SIZE // 16

    def test_sample_bilinear_wrap(self):
        pages = build_texture_pages([])
        # paint a gradient into page 0 for the test
        s = PAGE_SIZE
        grad = jnp.linspace(0, 1, s)[None, :, None, None]
        tex = jnp.broadcast_to(grad, (1, s, s, 4)).transpose(0, 2, 1, 3)
        pages = [tex] + list(pages[1:])
        uv = jnp.asarray([[0.25, 0.5], [0.75, 0.5], [1.25, 0.5]])
        out = sample_pages(pages, jnp.zeros((3,), jnp.int32), uv, mip=0)
        assert abs(float(out[0, 0]) - 0.25) < 0.01
        assert abs(float(out[1, 0]) - 0.75) < 0.01
        # wrap: u=1.25 == u=0.25
        assert abs(float(out[2, 0]) - float(out[0, 0])) < 1e-5

    def test_mip_is_average(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (64, 64, 4)).astype(np.float32)
        import PIL.Image

        p = "/tmp/_tex_test.png"
        PIL.Image.fromarray((img * 255).astype(np.uint8)).save(p)
        pages = build_texture_pages([p], srgb=False)
        m0 = np.asarray(pages[0][1])
        m2 = np.asarray(pages[2][1])
        assert abs(m0.mean() - m2.mean()) < 0.01


@pytest.mark.skipif(not os.path.isdir(REF_ASSETS), reason="no reference assets")
class TestSceneIntegration:
    def test_textured_scene_gbuffer(self):
        """The mini-diorama has real textures; a textured gbuffer must show
        albedo variation inside a single material."""
        from kajiya_tpu.scene.cache import load_mesh_cached
        from kajiya_tpu.scene.scene import Scene, build_gpu_scene

        path = os.path.join(
            REF_ASSETS, "meshes/pica_pica_-_mini_diorama_01/scene.gltf")
        scene = Scene()
        scene.add_instance(scene.add_mesh(load_mesh_cached(path)))
        gpu = build_gpu_scene(scene)
        assert gpu.tex_pages is not None
        assert gpu.mat_tex is not None
        assert gpu.tex_pages[0].shape[0] > 1      # at least one real texture
