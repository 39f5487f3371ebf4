"""Reference path tracer oracle tests: analytic furnace, NEE/MIS consistency.

This is the ground-truth layer everything else is RMSE-tested against
(SURVEY.md section 3.4: the PT mode is the reference's only oracle too).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kajiya_tpu.core import camera
from kajiya_tpu.renderers import reference as ref
from kajiya_tpu.scene import procedural
from kajiya_tpu.scene.mesh import Material, PackedMesh
from kajiya_tpu.scene.scene import Scene, build_gpu_scene
from kajiya_tpu.world import build_trace_scene


def big_plane_scene(albedo=0.5, roughness=1.0, metallic=0.0):
    """Huge diffuse plane at y=0 (approximates an infinite plane)."""
    s = 5000.0
    verts = np.array([[-s, 0, -s], [s, 0, -s], [s, 0, s], [-s, 0, s]], np.float32)
    mesh = PackedMesh(
        positions=verts,
        normals=np.tile(np.array([0, 1, 0], np.float32), (4, 1)),
        uvs=np.zeros((4, 2), np.float32),
        tangents=np.tile(np.array([1, 0, 0, 1], np.float32), (4, 1)),
        colors=np.ones((4, 4), np.float32),
        indices=np.array([[0, 2, 1], [0, 3, 2]], np.uint32),
        material_ids=np.zeros(2, np.uint32),
        materials=[Material(
            base_color=np.array([albedo] * 3 + [1.0], np.float32),
            emissive=np.zeros(3, np.float32),
            metallic=metallic, roughness=roughness)],
    )
    scene = Scene(sun_intensity=0.0)
    scene.add_instance(scene.add_mesh(mesh))
    return scene


def trace_plane(albedo, spp=48, bounces=4, roughness=1.0, metallic=0.0):
    gpu = build_gpu_scene(big_plane_scene(albedo, roughness, metallic))
    ts, _ = build_trace_scene(gpu)
    W = H = 32
    vc = camera.make_view_constants(
        position=(0, 3, 0), forward=(0.3, -1, 0.2), fov_y_deg=40, width=W, height=H)
    white_sky = lambda d: jnp.ones(d.shape[:-1] + (3,))
    org, d = camera.camera_rays(vc, W, H)
    orgf, df = org.reshape(-1, 3), d.reshape(-1, 3)
    px = jnp.arange(W * H, dtype=jnp.uint32)

    @jax.jit
    def sample(f):
        from kajiya_tpu.core import rng as rng_mod
        seed = rng_mod.hash3(px, jnp.uint32(f), jnp.uint32(0))
        return ref.path_trace(ts, orgf, df, seed, num_bounces=bounces,
                              sun_nee=False, light_nee=False, sky_fn=white_sky)

    acc = jnp.zeros((W * H, 3))
    for f in range(spp):
        acc = acc + sample(f)
    return np.asarray(acc / spp)


class TestFurnace:
    def test_diffuse_plane_under_white_sky(self):
        """Analytic: an infinite plane with diffuse albedo a under a uniform
        unit-radiance sky. The layered material adds a ~4% dielectric specular
        lobe on top of a*(1-F), so (i) each result must sit in the physical
        band [0.96a, a + 0.07], and (ii) the DIFFERENCE between two albedos —
        where the identical specular term cancels — must be (a2-a1)*(1-F)."""
        means = {}
        for a in (0.25, 0.75):
            img = trace_plane(a)
            means[a] = img.mean()
            assert 0.96 * a - 0.01 < means[a] < a + 0.07, f"albedo {a}: {means[a]}"
        diff = means[0.75] - means[0.25]
        assert abs(diff - 0.5 * 0.96) < 0.03, f"albedo delta: {diff}"

    def test_white_furnace_metal(self):
        """Rough metal with base_color 1 under uniform sky must stay close to 1
        (energy-preserving multi-scatter compensation keeps it from darkening)."""
        img = trace_plane(1.0, roughness=0.6, metallic=1.0, bounces=6, spp=64)
        mean = img.mean()
        assert 0.9 < mean < 1.1, f"metal furnace: {mean}"


class TestCornellBox:
    @pytest.fixture(scope="class")
    def ts(self):
        gpu = build_gpu_scene(procedural.cornell_box())
        ts, _ = build_trace_scene(gpu)
        return ts

    def _render_mean(self, ts, spp, **kw):
        W = H = 32
        vc = camera.make_view_constants(
            position=(0, 0, 2.9), forward=(0, 0, -1), fov_y_deg=45, width=W, height=H)
        org, d = camera.camera_rays(vc, W, H)
        orgf, df = org.reshape(-1, 3), d.reshape(-1, 3)
        px = jnp.arange(W * H, dtype=jnp.uint32)
        black = lambda d: jnp.zeros(d.shape[:-1] + (3,))

        @jax.jit
        def sample(f):
            from kajiya_tpu.core import rng as rng_mod
            seed = rng_mod.hash3(px, jnp.uint32(f), jnp.uint32(7))
            return ref.path_trace(ts, orgf, df, seed, num_bounces=5,
                                  sun_nee=False, sky_fn=black, **kw)

        acc = jnp.zeros((W * H, 3))
        for f in range(spp):
            acc = acc + sample(f)
        return np.asarray(acc / spp)

    def test_nee_and_brdf_sampling_agree(self, ts):
        """Emissive-triangle NEE with MIS must converge to the same image as
        pure BRDF sampling (unbiasedness of the MIS combination)."""
        with_nee = self._render_mean(ts, spp=64, light_nee=True)
        without = self._render_mean(ts, spp=512, light_nee=False)
        m1, m2 = with_nee.mean(), without.mean()
        assert abs(m1 - m2) / max(m2, 1e-6) < 0.08, f"NEE {m1} vs BRDF-only {m2}"

    def test_light_pixels_brightest(self, ts):
        img = self._render_mean(ts, spp=8).reshape(32, 32, 3)
        # the emissive panel (image top, center) outshines everything else
        top = img[2:6, 12:20].mean()
        rest = img[16:, :].mean()
        assert top > 5 * rest

    def test_no_nans_high_bounce(self, ts):
        img = self._render_mean(ts, spp=4)
        assert np.isfinite(img).all()
