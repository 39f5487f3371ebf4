"""Texture pages: decode, buckets/packing, mips, sampling, color space."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from kajiya_tpu.scene.textures import (BUCKETS, N_MIPS, PAGE_SIZE,
                                       build_texture_pages, sample_pages)

REF_ASSETS = "/root/reference/assets"


def _save_png(arr_u8, path):
    import PIL.Image

    PIL.Image.fromarray(arr_u8).save(path)
    return path


def _mip_region(atlas, m):
    """Slice mip level m out of the packed atlas (see build_texture_pages)."""
    s = atlas.shape[1]
    if m == 0:
        return atlas[:, :s, :s]
    sm = s >> m
    y0 = s - 2 * sm
    return atlas[:, y0:y0 + sm, s:s + sm]


class TestPages:
    def test_white_page_default(self):
        pages, sub = build_texture_pages([])
        assert pages.shape == (1, PAGE_SIZE, PAGE_SIZE + PAGE_SIZE // 2, 4)
        assert pages.dtype == jnp.uint8
        for m in range(N_MIPS):
            assert int(_mip_region(pages, m).min()) == 255
        assert list(np.asarray(sub[0])) == [0, PAGE_SIZE, 0, 0]

    def test_bucket_sizes_and_packing(self):
        rng = np.random.default_rng(0)
        paths = []
        for i, side in enumerate([1024, 300, 100, 64, 64]):
            img = rng.integers(0, 255, (side, side, 4), dtype=np.uint8)
            paths.append(_save_png(img, f"/tmp/_tex_b{i}.png"))
        pages, sub = build_texture_pages(paths)
        sub = np.asarray(sub)
        # slot 0 = white page; buckets keep native detail: 1024 stays 1024
        # (the page grows to match), 300->512, 100->128, 64->128
        assert sub[1, 1] == 1024 and sub[2, 1] == 512
        assert sub[3, 1] == 128 and sub[4, 1] == 128
        assert pages.shape[1] == 1024             # adaptive page size
        assert _mip_region(pages, 6).shape[1] == 16   # mip floor stays 16^2
        # subregions within a page must not overlap
        boxes = {}
        for p, size, ox, oy in sub:
            boxes.setdefault(p, []).append((ox, oy, ox + size, oy + size))
        for bs in boxes.values():
            for i in range(len(bs)):
                for j in range(i + 1, len(bs)):
                    a, b = bs[i], bs[j]
                    assert (a[2] <= b[0] or b[2] <= a[0]
                            or a[3] <= b[1] or b[3] <= a[1])

    def test_sample_bilinear_wrap(self):
        # horizontal gradient image: u=1.25 must equal u=0.25 (wrap)
        g = np.linspace(0, 255, 256).astype(np.uint8)
        img = np.broadcast_to(g[None, :, None], (256, 256, 4)).copy()
        pages, sub = build_texture_pages([_save_png(img, "/tmp/_tex_g.png")])
        idx = jnp.ones((3,), jnp.int32)
        uv = jnp.asarray([[0.25, 0.5], [0.75, 0.5], [1.25, 0.5]])
        out = sample_pages(pages, sub, idx, uv, mip=0)
        assert abs(float(out[0, 0]) - 0.25) < 0.01
        assert abs(float(out[1, 0]) - 0.75) < 0.01
        assert abs(float(out[2, 0]) - float(out[0, 0])) < 1e-5

    def test_mip_is_average(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (256, 256, 4), dtype=np.uint8)
        pages, sub = build_texture_pages([_save_png(img, "/tmp/_tex_m.png")])
        s, ox, oy = (int(x) for x in np.asarray(sub[1])[1:])
        m0 = np.asarray(_mip_region(pages, 0)[-1])[oy:oy + s, ox:ox + s]
        m2 = np.asarray(_mip_region(pages, 2)[-1])[
            oy >> 2:(oy + s) >> 2, ox >> 2:(ox + s) >> 2]
        assert abs(m0.mean() - m2.mean()) < 1.5

    def test_dynamic_mip_matches_static(self):
        """A per-ray mip through the atlas index transform must return the
        same texels as the static-mip path (the ray-cone LOD contract)."""
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (256, 256, 4), dtype=np.uint8)
        pages, sub = build_texture_pages([_save_png(img, "/tmp/_tex_d.png")])
        idx = jnp.ones((5,), jnp.int32)
        uv = jnp.asarray([[0.13, 0.77], [0.5, 0.5], [0.9, 0.1],
                          [0.33, 0.66], [0.25, 0.75]])
        for m in range(4):
            stat = sample_pages(pages, sub, idx, uv, mip=m, nearest=True)
            # lod_base such that lod_base + log2(size) == m exactly
            size = float(np.asarray(sub)[1, 1])
            lb = jnp.full((5,), m - np.log2(size), jnp.float32)
            dyn = sample_pages(pages, sub, idx, uv, lod_base=lb,
                               nearest=True)
            np.testing.assert_array_equal(np.asarray(stat), np.asarray(dyn))
        # mixed per-ray mips: each lane matches its own static fetch
        lb = jnp.asarray([0, 1, 2, 3, 1], jnp.float32) - np.log2(
            float(np.asarray(sub)[1, 1]))
        dyn = sample_pages(pages, sub, idx, uv, lod_base=lb, nearest=True)
        for i, m in enumerate([0, 1, 2, 3, 1]):
            stat = sample_pages(pages, sub, idx, uv, mip=m, nearest=True)
            np.testing.assert_array_equal(np.asarray(stat)[i],
                                          np.asarray(dyn)[i])

    def test_srgb_per_slot(self):
        """The same texel read as color (srgb) vs data (linear) must differ
        by exactly the sRGB EOTF — the ADVICE r1 color-space fix."""
        img = np.full((64, 64, 4), 128, np.uint8)
        pages, sub = build_texture_pages([_save_png(img, "/tmp/_tex_s.png")])
        idx = jnp.ones((1,), jnp.int32)
        uv = jnp.asarray([[0.5, 0.5]])
        lin = sample_pages(pages, sub, idx, uv, nearest=True)
        col = sample_pages(pages, sub, idx, uv, nearest=True, srgb=True)
        assert abs(float(lin[0, 0]) - 128 / 255) < 5e-3
        # sRGB ~0.5 -> linear ~0.214
        assert abs(float(col[0, 0]) - 0.214) < 1e-2
        # alpha is never decoded
        assert abs(float(col[0, 3]) - float(lin[0, 3])) < 1e-6

    def test_small_texture_keeps_content_through_mips(self):
        img = np.zeros((128, 128, 4), np.uint8)
        img[:, :64] = 255
        pages, sub = build_texture_pages([_save_png(img, "/tmp/_tex_h.png")])
        idx = jnp.ones((2,), jnp.int32)
        uv = jnp.asarray([[0.20, 0.5], [0.80, 0.5]])
        for mip in range(3):
            out = sample_pages(pages, sub, idx, uv, mip=mip, nearest=True)
            assert float(out[0, 0]) > 0.9
            assert float(out[1, 0]) < 0.1


class TestTangents:
    def test_generated_tangents_follow_uv(self):
        from kajiya_tpu.scene.gltf import generate_tangents

        # a quad in the XZ plane, u along +x, v along +z
        pos = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]], np.float32)
        nrm = np.tile(np.array([0, 1, 0], np.float32), (4, 1))
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        idx = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
        tan = generate_tangents(pos, nrm, uv, idx)
        assert tan.shape == (4, 4)
        np.testing.assert_allclose(tan[:, :3], np.tile([1, 0, 0], (4, 1)),
                                   atol=1e-5)
        assert np.all(np.abs(tan[:, 3]) == 1.0)
        # orthogonal to the normal
        assert np.abs((tan[:, :3] * nrm).sum(-1)).max() < 1e-5

    def test_degenerate_uv_fallback(self):
        from kajiya_tpu.scene.gltf import generate_tangents

        pos = np.array([[0, 0, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        nrm = np.tile(np.array([0, 1, 0], np.float32), (3, 1))
        uv = np.zeros((3, 2), np.float32)      # no UV gradient at all
        idx = np.array([[0, 1, 2]], np.uint32)
        tan = generate_tangents(pos, nrm, uv, idx)
        ln = np.linalg.norm(tan[:, :3], axis=-1)
        np.testing.assert_allclose(ln, 1.0, atol=1e-5)
        assert np.abs((tan[:, :3] * nrm).sum(-1)).max() < 1e-5


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
        assert gpu.page_sub is not None
        assert gpu.page_sub.shape[0] > 1          # at least one real texture


class TestDds:
    def test_dds_source_decodes(self):
        """DDS image sources load through the page builder (the reference's
        image.rs DDS passthrough; decoded to dense pages at bake)."""
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (64, 64, 4), dtype=np.uint8)
        from PIL import Image
        Image.fromarray(img).save("/tmp/_tex_dds.dds")
        pages, sub = build_texture_pages(["/tmp/_tex_dds.dds"])
        sub = np.asarray(sub)
        assert sub[1, 1] == 128          # 64 -> bucket 128
        p, size, ox, oy = sub[1]
        got = np.asarray(_mip_region(pages, 0))[p, oy:oy + size, ox:ox + size]
        # resized content, not the white fallback
        assert got.std() > 20
