"""Unit tests for core math: camera, rng, color."""
import jax.numpy as jnp
import numpy as np
import pytest

from kajiya_tpu.core import camera, color, rng


class TestCamera:
    def test_reversed_infinite_z_depth_range(self):
        near = 0.01
        m = camera.perspective_reversed_infinite_z(jnp.deg2rad(60.0), 16 / 9, near)
        # point at the near plane -> depth 1
        p = m @ jnp.array([0.0, 0.0, -near, 1.0])
        assert np.isclose(p[2] / p[3], 1.0, atol=1e-5)
        # far away -> depth ~0
        p = m @ jnp.array([0.0, 0.0, -1e6, 1.0])
        assert abs(p[2] / p[3]) < 1e-3

    def test_projection_roundtrip(self):
        fwd = camera.perspective_reversed_infinite_z(1.0, 1.5, 0.01)
        inv = camera.inverse_perspective_reversed_infinite_z(1.0, 1.5, 0.01)
        assert np.allclose(np.asarray(fwd @ inv), np.eye(4), atol=1e-5)

    def test_view_roundtrip(self):
        rot = camera.look_rotation(jnp.array([0.3, -0.2, -1.0]))
        w2v = camera.world_to_view_from(jnp.array([1.0, 2.0, 3.0]), rot)
        v2w = camera.view_to_world_from(jnp.array([1.0, 2.0, 3.0]), rot)
        assert np.allclose(np.asarray(w2v @ v2w), np.eye(4), atol=1e-5)

    def test_look_rotation_orthonormal(self):
        r = np.asarray(camera.look_rotation(jnp.array([0.5, 0.1, -1.0])))
        assert np.allclose(r.T @ r, np.eye(3), atol=1e-5)
        # -Z column is the forward direction
        f = np.array([0.5, 0.1, -1.0])
        f = f / np.linalg.norm(f)
        assert np.allclose(-r[:, 2], f, atol=1e-5)

    def test_camera_rays_center(self):
        vc = camera.make_view_constants(
            position=(0, 0, 0), forward=(0, 0, -1), fov_y_deg=60.0,
            width=64, height=64)
        org, d = camera.camera_rays(vc, 64, 64)
        assert org.shape == (64, 64, 3) and d.shape == (64, 64, 3)
        # all unit length
        assert np.allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)
        # center pixels point roughly along -Z
        center = np.asarray(d[31:33, 31:33]).mean(axis=(0, 1))
        assert center[2] < -0.99

    def test_camera_rays_fov(self):
        vc = camera.make_view_constants(
            position=(0, 0, 0), forward=(0, 0, -1), fov_y_deg=90.0,
            width=128, height=128)
        _, d = camera.camera_rays(vc, 128, 128)
        top = np.asarray(d[0, 64])
        # 90 deg vertical fov -> top edge at ~45 deg: y/|z| ~ tan(45)*(1-1/128)
        assert abs(top[1] / -top[2] - np.tan(np.deg2rad(45)) * (1 - 1 / 128)) < 0.02


class TestRng:
    def test_pcg_hash_distribution(self):
        x = jnp.arange(100000, dtype=jnp.uint32)
        h = rng.u01(rng.pcg_hash(x))
        h = np.asarray(h)
        assert 0.0 <= h.min() and h.max() < 1.0
        assert abs(h.mean() - 0.5) < 0.01
        assert abs(np.var(h) - 1 / 12) < 0.01

    def test_hash_decorrelation(self):
        x = jnp.arange(10000, dtype=jnp.uint32)
        a = np.asarray(rng.u01(rng.hash_combine(x, 1)))
        b = np.asarray(rng.u01(rng.hash_combine(x, 2)))
        assert abs(np.corrcoef(a, b)[0, 1]) < 0.05

    def test_halton(self):
        pts = rng.halton23_sequence(128)
        assert pts.shape == (128, 2)
        assert pts.min() >= 0 and pts.max() < 1
        # first Halton(2) values: 1/2, 1/4, 3/4
        assert np.allclose(pts[:3, 0], [0.5, 0.25, 0.75])
        assert np.allclose(pts[:2, 1], [1 / 3, 2 / 3])

    def test_r2_low_discrepancy(self):
        pts = np.asarray(rng.r2_sequence(jnp.arange(4096)))
        assert abs(pts.mean() - 0.5) < 0.02


class TestColor:
    def test_srgb_roundtrip(self):
        x = jnp.linspace(0, 1, 256)
        back = color.srgb_decode(color.srgb_encode(x))
        assert np.allclose(np.asarray(back), np.asarray(x), atol=1e-5)

    def test_luminance_white(self):
        assert np.isclose(float(color.luminance(jnp.ones(3))), 1.0, atol=1e-5)

    def test_ycbcr_roundtrip(self):
        rgb = jnp.array([[0.2, 0.5, 0.8], [1.0, 0.0, 0.3]])
        back = color.ycbcr_to_lin(color.lin_to_ycbcr(rgb))
        assert np.allclose(np.asarray(back), np.asarray(rgb), atol=1e-4)
