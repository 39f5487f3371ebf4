"""BVH build + traversal correctness vs brute-force intersection."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kajiya_tpu.rt import bvh_from_scene, refit_bvh, trace_closest, trace_shadow
from kajiya_tpu.rt.trace import _tri_intersect, INF
from kajiya_tpu.scene import procedural
from kajiya_tpu.scene.scene import build_gpu_scene


def brute_force_closest(tris, org, d, t_min=1e-4):
    """Reference: test every ray against every triangle."""
    v0, e1, e2 = (np.asarray(x) for x in tris)
    org, d = np.asarray(org), np.asarray(d)
    R, T = org.shape[0], v0.shape[0]
    t, u, v, valid = _tri_intersect(
        jnp.asarray(org[:, None, :]), jnp.asarray(d[:, None, :]),
        jnp.asarray(v0[None]), jnp.asarray(e1[None]), jnp.asarray(e2[None]))
    t = np.where(np.asarray(valid) & (np.asarray(t) > t_min), np.asarray(t), np.inf)
    best = t.argmin(axis=1)
    best_t = t[np.arange(R), best]
    best_tri = np.where(np.isfinite(best_t), best, -1)
    return best_t, best_tri


def random_rays(n, seed, extent=3.0):
    rng = np.random.default_rng(seed)
    org = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


class TestTraversal:
    @pytest.mark.parametrize("n_tris", [1, 7, 64, 500])
    def test_matches_brute_force(self, n_tris):
        gpu = build_gpu_scene(procedural.random_tri_soup(n_tris, seed=n_tris))
        bvh, levels, tris = bvh_from_scene(gpu)
        org, d = random_rays(512, seed=1)
        hit = trace_closest(bvh, tris, org, d)
        bt, btri = brute_force_closest(tris, org, d)

        ht = np.asarray(hit.t)
        htri = np.asarray(hit.tri)
        miss = btri < 0
        assert np.array_equal(htri < 0, miss), "hit/miss disagreement"
        np.testing.assert_allclose(ht[~miss], bt[~miss], rtol=1e-3, atol=1e-4)
        # same triangle (or an equally close one)
        if (~miss).any():
            same = htri[~miss] == btri[~miss]
            assert same.mean() > 0.99

    def test_shadow_matches_closest(self):
        gpu = build_gpu_scene(procedural.random_tri_soup(200, seed=3))
        bvh, levels, tris = bvh_from_scene(gpu)
        org, d = random_rays(512, seed=2)
        occluded = np.asarray(trace_shadow(bvh, tris, org, d))
        _, btri = brute_force_closest(tris, org, d)
        assert np.array_equal(occluded, btri >= 0)

    def test_t_max_respected(self):
        gpu = build_gpu_scene(procedural.single_triangle())
        bvh, levels, tris = bvh_from_scene(gpu)
        org = jnp.array([[0.0, 0.0, 5.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        hit_far = trace_closest(bvh, tris, org, d, t_max=jnp.float32(10.0))
        hit_near = trace_closest(bvh, tris, org, d, t_max=jnp.float32(2.0))
        assert int(hit_far.tri[0]) == 0 and np.isclose(float(hit_far.t[0]), 5.0, atol=1e-4)
        assert int(hit_near.tri[0]) == -1

    def test_barycentrics(self):
        gpu = build_gpu_scene(procedural.single_triangle())
        bvh, levels, tris = bvh_from_scene(gpu)
        # aim at vertex 1 (1,-1,0): u ~ 1
        org = jnp.array([[0.99, -0.98, 5.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        hit = trace_closest(bvh, tris, org, d)
        assert float(hit.u[0]) > 0.9

    def test_inside_cornell_box(self):
        gpu = build_gpu_scene(procedural.cornell_box())
        bvh, levels, tris = bvh_from_scene(gpu)
        # axis rays from the center: box is open at +Z (camera side), closed elsewhere
        org = jnp.zeros((6, 3), jnp.float32)
        d = jnp.array([[0, 0, -1], [0, 0, 1], [0, 1, 0], [0, -1, 0],
                       [1, 0, 0], [-1, 0, 0]], jnp.float32)
        hit = trace_closest(bvh, tris, org, d)
        t = np.asarray(hit.t)
        tri = np.asarray(hit.tri)
        assert tri[1] == -1                      # +Z escapes through the opening
        assert np.all(tri[[0, 2, 3, 4, 5]] >= 0)  # all walls hit
        np.testing.assert_allclose(t[[0, 3, 4, 5]], 1.0, atol=1e-4)  # back/floor/right/left at 1
        np.testing.assert_allclose(t[2], 0.995, atol=1e-4)           # +Y hits the light quad first

    def test_jit_and_grad_free(self):
        gpu = build_gpu_scene(procedural.random_tri_soup(50, seed=9))
        bvh, levels, tris = bvh_from_scene(gpu)
        org, d = random_rays(128, seed=7)
        jitted = jax.jit(lambda o, dd: trace_closest(bvh, tris, o, dd).t)
        t1 = jitted(org, d)
        t2 = trace_closest(bvh, tris, org, d).t
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-5)


class TestRefit:
    def test_refit_after_translation(self):
        scene = procedural.random_tri_soup(100, seed=11)
        gpu = build_gpu_scene(scene)
        bvh, levels, tris = bvh_from_scene(gpu)

        # move the instance and refit
        shift = jnp.asarray([[0.0, 0.0, 0.0, 100.0], [0, 0, 0, 0], [0, 0, 0, 0]], jnp.float32)
        gpu_moved = jax.tree_util.tree_map(lambda x: x, gpu)
        gpu_moved.xforms = gpu.xforms + shift[None]
        v0, e1, e2 = gpu_moved.triangle_corners()
        bvh2 = refit_bvh(bvh, levels, v0, e1, e2)

        org, d = random_rays(256, seed=12)
        org_shifted = org + jnp.array([100.0, 0.0, 0.0])
        hit_old = trace_closest(bvh, tris, org, d)
        hit_new = trace_closest(bvh2, (v0, e1, e2), org_shifted, d)
        np.testing.assert_allclose(
            np.asarray(hit_old.t), np.asarray(hit_new.t), rtol=1e-3, atol=1e-3)
        assert np.array_equal(np.asarray(hit_old.tri), np.asarray(hit_new.tri))

    def test_refit_bounds_contain_tris(self):
        gpu = build_gpu_scene(procedural.random_tri_soup(64, seed=13))
        bvh, levels, tris = bvh_from_scene(gpu)
        v0, e1, e2 = tris
        bvh2 = refit_bvh(bvh, levels, v0, e1, e2)
        # root bounds must contain all verts
        pts = np.concatenate([np.asarray(v0), np.asarray(v0 + e1), np.asarray(v0 + e2)])
        assert np.all(np.asarray(bvh2.node_min[0]) <= pts.min(0) + 1e-4)
        assert np.all(np.asarray(bvh2.node_max[0]) >= pts.max(0) - 1e-4)
