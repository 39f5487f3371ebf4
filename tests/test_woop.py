"""MXU brute-force intersector vs the BVH traversal oracle."""
import numpy as np
import jax
import jax.numpy as jnp

from kajiya_tpu.ops.woop import TRI_BLOCK, build_woop, intersect_brute
from kajiya_tpu.rt.trace import trace_closest, trace_shadow
from kajiya_tpu.rt.bvh import bvh_from_scene
from kajiya_tpu.scene.procedural import cornell_box, random_tri_soup
from kajiya_tpu.scene.scene import build_gpu_scene


def _pad(t):
    return -(-t // TRI_BLOCK) * TRI_BLOCK


def _rand_rays(n, seed, extent=3.0):
    rng = np.random.default_rng(seed)
    org = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


class TestBruteMatchesBvh:
    def _check_scene(self, scene, n_rays=2048, seed=1, extent=3.0):
        gpu = build_gpu_scene(scene)
        bvh, _, tris = bvh_from_scene(gpu)
        v0, e1, e2 = tris
        woop = build_woop(v0, e1, e2, pad_to=_pad(v0.shape[0]))
        org, d = _rand_rays(n_rays, seed, extent)

        ref = trace_closest(bvh, tris, org, d)
        t, tri, u, v = jax.jit(lambda: intersect_brute(woop, org, d))()

        hit_ref = np.asarray(ref.tri) >= 0
        hit_new = np.asarray(tri) >= 0
        assert (hit_ref == hit_new).mean() > 0.999
        both = hit_ref & hit_new
        np.testing.assert_allclose(np.asarray(t)[both],
                                   np.asarray(ref.t)[both], rtol=2e-4,
                                   atol=1e-5)
        # same triangle (modulo coplanar ties): t agreement is the contract
        same_tri = (np.asarray(tri)[both] == np.asarray(ref.tri)[both])
        assert same_tri.mean() > 0.98

    def test_cornell(self):
        self._check_scene(cornell_box())

    def test_tri_soup(self):
        self._check_scene(random_tri_soup(500, seed=3), extent=8.0)

    def test_t_max_respected(self):
        gpu = build_gpu_scene(cornell_box())
        _, _, tris = bvh_from_scene(gpu)
        v0, e1, e2 = tris
        woop = build_woop(v0, e1, e2, pad_to=_pad(v0.shape[0]))
        org = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        t, tri, _, _ = intersect_brute(woop, org, d)        # back wall at z=-1
        assert abs(float(t[0]) - 1.0) < 1e-4
        t2, tri2, _, _ = intersect_brute(woop, org, d, t_max=0.5)
        assert int(tri2[0]) == -1

    def test_shadow_dispatch(self):
        from kajiya_tpu.rt.trace import scene_trace_shadow
        from kajiya_tpu.world import build_trace_scene

        gpu = build_gpu_scene(cornell_box())
        ts, _ = build_trace_scene(gpu)
        assert ts.woop is not None  # cornell is small -> brute path
        org = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        assert bool(scene_trace_shadow(ts, org, d)[0])
        assert not bool(scene_trace_shadow(ts, org, d, t_max=0.5)[0])


class TestCulledBrute:
    def test_culled_matches_bvh_on_large_soup(self):
        """Scenes above BRUTE_FORCE_MAX_TRIS get cluster bounds; results must
        match the BVH traversal oracle."""
        from kajiya_tpu.world import BRUTE_FORCE_MAX_TRIS, build_trace_scene
        from kajiya_tpu.rt.trace import scene_trace_closest

        n = BRUTE_FORCE_MAX_TRIS + 2000
        gpu = build_gpu_scene(random_tri_soup(n, seed=7, extent=12.0))
        ts, _ = build_trace_scene(gpu)
        assert ts.woop is not None and "cmin" in ts.woop

        bvh, _, tris = bvh_from_scene(gpu)
        org, d = _rand_rays(512, seed=9, extent=14.0)
        ref = trace_closest(bvh, tris, org, d)
        hit = jax.jit(lambda: scene_trace_closest(ts, org, d))()
        hit_ref = np.asarray(ref.tri) >= 0
        hit_new = np.asarray(hit.tri) >= 0
        assert (hit_ref == hit_new).mean() > 0.999
        both = hit_ref & hit_new
        np.testing.assert_allclose(np.asarray(hit.t)[both],
                                   np.asarray(ref.t)[both], rtol=3e-4,
                                   atol=1e-5)

    def test_tiled_gbuffer_matches_untiled(self):
        """Tile-ordered tracing must produce the identical gbuffer."""
        from kajiya_tpu.core.camera import make_view_constants
        from kajiya_tpu.renderers.gbuffer import raytrace_gbuffer
        from kajiya_tpu.world import BRUTE_FORCE_MAX_TRIS, build_trace_scene

        n = BRUTE_FORCE_MAX_TRIS + 1000
        gpu = build_gpu_scene(random_tri_soup(n, seed=11, extent=6.0))
        ts, _ = build_trace_scene(gpu)
        assert "cmin" in ts.woop
        view = make_view_constants((0, 0, 8.0), (0, 0, -1), width=96, height=80)
        gb = jax.jit(lambda: raytrace_gbuffer(ts, view, 96, 80,
                                              max_trace_steps=256))()
        # reference: force the untiled path by stripping clusters
        w2 = dict(ts.woop)
        w2.pop("cmin"); w2.pop("cmax")
        ts2 = build_trace_scene(gpu)[0]
        ts2.woop = w2
        gb2 = jax.jit(lambda: raytrace_gbuffer(ts2, view, 96, 80,
                                               max_trace_steps=256))()
        np.testing.assert_array_equal(np.asarray(gb["hit"]),
                                      np.asarray(gb2["hit"]))
        np.testing.assert_allclose(np.asarray(gb["depth"]),
                                   np.asarray(gb2["depth"]), rtol=1e-5)
