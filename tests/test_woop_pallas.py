"""Pallas intersector (interpret mode on CPU) vs the XLA reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kajiya_tpu.ops.woop import build_woop, intersect_brute
from kajiya_tpu.ops.woop_pallas import TRI_BLOCK, intersect_brute_pallas
from kajiya_tpu.rt.bvh import bvh_from_scene
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene


def _setup(scene):
    gpu = build_gpu_scene(scene)
    _, _, (v0, e1, e2) = bvh_from_scene(gpu)
    blk = max(TRI_BLOCK, 256)     # multiple of both implementations' blocks
    pad = -(-v0.shape[0] // blk) * blk
    return build_woop(v0, e1, e2, pad_to=pad)


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    org = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


class TestPallasIntersector:
    def test_matches_xla_reference(self):
        woop = _setup(cornell_box())
        org, d = _rays(1024)
        t0, tri0, u0, v0 = intersect_brute(woop, org, d)
        t1, tri1, u1, v1 = intersect_brute_pallas(woop, org, d,
                                                  interpret=True)
        hit0 = np.asarray(tri0) >= 0
        hit1 = np.asarray(tri1) >= 0
        assert (hit0 == hit1).all()
        np.testing.assert_allclose(np.asarray(t1)[hit0],
                                   np.asarray(t0)[hit0], rtol=1e-4)
        same = np.asarray(tri1)[hit0] == np.asarray(tri0)[hit0]
        assert same.mean() > 0.98     # coplanar ties may differ

    def test_t_max(self):
        woop = _setup(cornell_box())
        org = jnp.zeros((8, 3), jnp.float32)
        d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (8, 1))
        t, tri, _, _ = intersect_brute_pallas(woop, org, d, t_max=0.5,
                                              interpret=True)
        assert (np.asarray(tri) == -1).all()
        t, tri, _, _ = intersect_brute_pallas(woop, org, d, interpret=True)
        assert (np.asarray(tri) >= 0).all()
        np.testing.assert_allclose(np.asarray(t), 1.0, rtol=1e-4)
