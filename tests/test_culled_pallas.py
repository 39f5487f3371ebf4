"""Cluster-culled streaming tracer vs the dense reference intersector."""
import jax
import jax.numpy as jnp
import numpy as np

from kajiya_tpu.ops.woop import build_clusters, build_woop, intersect_brute
from kajiya_tpu.ops.woop_pallas import (CULL_TB, intersect_culled_pallas)


def _random_soup(n_tri, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-spread, spread, (n_tri, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.6, (n_tri, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.6, (n_tri, 3)).astype(np.float32)
    return jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    org = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def test_culled_matches_brute():
    n_tri = 1000
    v0, e1, e2 = _random_soup(n_tri)
    pad = -(-n_tri // 256) * 256
    woop = build_woop(v0, e1, e2, pad_to=pad)
    woop["cmin"], woop["cmax"] = build_clusters(v0, e1, e2, pad_to=pad)
    woop["cmin64"], woop["cmax64"] = build_clusters(
        v0, e1, e2, pad_to=pad, tri_block=CULL_TB)

    org, d = _rays(4096)
    t_ref, tri_ref, u_ref, v_ref = intersect_brute(woop, org, d)
    t_c, tri_c, u_c, v_c = intersect_culled_pallas(woop, org, d,
                                                   interpret=True)
    t_ref, tri_ref = np.asarray(t_ref), np.asarray(tri_ref)
    t_c, tri_c = np.asarray(t_c), np.asarray(tri_c)
    # same hits (modulo exact ties): compare t values
    np.testing.assert_allclose(
        np.where(np.isfinite(t_ref), t_ref, 0.0),
        np.where(np.isfinite(t_c), t_c, 0.0), rtol=2e-5, atol=2e-5)
    assert (tri_ref >= 0).sum() == (tri_c >= 0).sum()
    same = tri_ref == tri_c
    assert same.mean() > 0.999     # ties on coplanar tris may differ


def test_culled_any_hit():
    n_tri = 600
    v0, e1, e2 = _random_soup(n_tri, seed=3)
    pad = -(-n_tri // 256) * 256
    woop = build_woop(v0, e1, e2, pad_to=pad)
    woop["cmin"], woop["cmax"] = build_clusters(v0, e1, e2, pad_to=pad)
    woop["cmin64"], woop["cmax64"] = build_clusters(
        v0, e1, e2, pad_to=pad, tri_block=CULL_TB)
    org, d = _rays(2048, seed=4)
    t_ref, tri_ref, _, _ = intersect_brute(woop, org, d)
    _, tri_c, _, _ = intersect_culled_pallas(woop, org, d, any_hit=True,
                                             interpret=True)
    occ_ref = np.asarray(tri_ref) >= 0
    occ_c = np.asarray(tri_c) >= 0
    np.testing.assert_array_equal(occ_ref, occ_c)


def test_culled_respects_tmax():
    n_tri = 400
    v0, e1, e2 = _random_soup(n_tri, seed=5)
    pad = -(-n_tri // 256) * 256
    woop = build_woop(v0, e1, e2, pad_to=pad)
    woop["cmin"], woop["cmax"] = build_clusters(v0, e1, e2, pad_to=pad)
    woop["cmin64"], woop["cmax64"] = build_clusters(
        v0, e1, e2, pad_to=pad, tri_block=CULL_TB)
    org, d = _rays(2048, seed=6)
    tmax = jnp.full((2048,), 4.0)
    t_ref, tri_ref, _, _ = intersect_brute(woop, org, d, t_max=tmax)
    t_c, tri_c, _, _ = intersect_culled_pallas(woop, org, d, t_max=tmax,
                                               interpret=True)
    np.testing.assert_allclose(
        np.where(np.isfinite(np.asarray(t_ref)), np.asarray(t_ref), 0.0),
        np.where(np.isfinite(np.asarray(t_c)), np.asarray(t_c), 0.0),
        rtol=2e-5, atol=2e-5)


def test_culled_divergent_chunk_no_false_negatives():
    """Advisor repro (round 2): a chunk with 1800 +x rays and 248 -x rays
    against two walls must find ALL backward hits — the cone cull must be
    disabled for chunks whose rays don't fit a genuine cone."""
    def wall(x, n=64, half=20.0):
        # a wall at plane x=const made of n*n*2 triangles
        ys = np.linspace(-half, half, n + 1)
        zs = np.linspace(-half, half, n + 1)
        v0, e1, e2 = [], [], []
        for i in range(n):
            for j in range(n):
                a = [x, ys[i], zs[j]]
                b = [x, ys[i + 1], zs[j]]
                c = [x, ys[i], zs[j + 1]]
                dpt = [x, ys[i + 1], zs[j + 1]]
                v0.append(a)
                e1.append(np.subtract(b, a))
                e2.append(np.subtract(c, a))
                v0.append(dpt)
                e1.append(np.subtract(b, dpt))
                e2.append(np.subtract(c, dpt))
        return (np.asarray(v0, np.float32), np.asarray(e1, np.float32),
                np.asarray(e2, np.float32))

    w1 = wall(+5.0, n=16)
    w2 = wall(-5.0, n=16)
    v0 = jnp.asarray(np.concatenate([w1[0], w2[0]]))
    e1 = jnp.asarray(np.concatenate([w1[1], w2[1]]))
    e2 = jnp.asarray(np.concatenate([w1[2], w2[2]]))
    n_tri = v0.shape[0]
    pad = -(-n_tri // 256) * 256
    woop = build_woop(v0, e1, e2, pad_to=pad)
    woop["cmin"], woop["cmax"] = build_clusters(v0, e1, e2, pad_to=pad)
    woop["cmin64"], woop["cmax64"] = build_clusters(
        v0, e1, e2, pad_to=pad, tri_block=CULL_TB)

    rng = np.random.default_rng(7)
    n_fwd, n_bwd = 1800, 248
    org = rng.uniform(-1, 1, (n_fwd + n_bwd, 3)).astype(np.float32)
    d = np.zeros((n_fwd + n_bwd, 3), np.float32)
    d[:n_fwd, 0] = 1.0
    d[n_fwd:, 0] = -1.0
    jit = rng.normal(0, 0.02, (n_fwd + n_bwd, 3)).astype(np.float32)
    d = d + jit
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    org, d = jnp.asarray(org), jnp.asarray(d)

    t_ref, tri_ref, _, _ = intersect_brute(woop, org, d)
    t_c, tri_c, _, _ = intersect_culled_pallas(woop, org, d, interpret=True)
    hit_ref = np.asarray(tri_ref) >= 0
    hit_c = np.asarray(tri_c) >= 0
    # every brute hit must be found by the culled path (no false negatives)
    assert hit_ref.all()
    np.testing.assert_array_equal(hit_ref, hit_c)
    np.testing.assert_allclose(np.asarray(t_ref), np.asarray(t_c),
                               rtol=2e-5, atol=2e-5)
