"""Sorted ray wavefronts (ops/raysort.py): permutation round-trip + parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kajiya_tpu.ops.raysort import ray_sort_key, sorted_trace

pytestmark = pytest.mark.fast


def _rays(n, seed=3):
    rng = np.random.default_rng(seed)
    org = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def test_key_locality():
    """Equal origin cell + direction cell -> equal key; distant -> differ."""
    org = jnp.array([[0.1, 0.1, 0.1], [0.11, 0.1, 0.1], [9.0, 9.0, 9.0]])
    d = jnp.array([[1.0, 0, 0], [1.0, 0, 0], [1.0, 0, 0]])
    smin, smax = jnp.zeros(3) - 0.0, jnp.ones(3) * 10.0
    k = np.asarray(ray_sort_key(org, d, smin, smax))
    assert k[0] == k[1]
    assert k[0] != k[2]


def test_sorted_trace_identity():
    """sorted_trace(fn) == fn — any trace_fn whose output is a pure
    per-ray function of the input must be invariant under the sort."""
    org, d = _rays(1000)
    woop = {"cmin64": jnp.array([[-5.0, -5, -5]]),
            "cmax64": jnp.array([[5.0, 5, 5]])}

    def fn(o, dd, tm):
        # arbitrary per-ray functions incl. an int payload and the tmax lane
        t = (o * dd).sum(-1)
        tri = (o[:, 0] * 100).astype(jnp.int32)
        return t, tri, tm

    t0, tri0, tm0 = fn(org, d, jnp.full((1000,), 7.5))
    t1, tri1, tm1 = sorted_trace(fn, woop, org, d, t_max=7.5)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(tri0), np.asarray(tri1))
    np.testing.assert_allclose(np.asarray(tm0), np.asarray(tm1))
    assert tri1.dtype == jnp.int32


def test_sorted_trace_large_int_payload_exact():
    """Integer payloads ride the wide-row gather as BITCAST columns, so
    tri ids >= 2^24 (where f32 loses integers) must survive exactly —
    as must bool hit masks."""
    n = 512
    org, d = _rays(n, seed=7)
    woop = {"cmin64": jnp.array([[-5.0, -5, -5]]),
            "cmax64": jnp.array([[5.0, 5, 5]])}
    big = jnp.arange(n, dtype=jnp.int32) * 7919 + (1 << 24) + 3

    def fn(o, dd, tm):
        # recover per-ray identity from the (sorted) origin payload
        idx = jnp.argmin(
            jnp.abs(o[:, None, 0] - org[None, :, 0]), axis=1)
        return big[idx], (idx % 2 == 0), o[:, 0].astype(jnp.bfloat16)

    tri0, m0, h0 = fn(org, d, None)
    tri1, m1, h1 = sorted_trace(fn, woop, org, d)
    np.testing.assert_array_equal(np.asarray(tri0), np.asarray(tri1))
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
    np.testing.assert_array_equal(np.asarray(h0, np.float32),
                                  np.asarray(h1, np.float32))
    assert tri1.dtype == jnp.int32 and m1.dtype == jnp.bool_
    assert h1.dtype == jnp.bfloat16


def test_scene_trace_sorted_parity():
    """sort=True through the real dispatch returns identical hits."""
    from kajiya_tpu.scene.procedural import random_tri_soup
    from kajiya_tpu.scene.scene import build_gpu_scene
    from kajiya_tpu.world import build_trace_scene
    from kajiya_tpu.rt.trace import scene_trace_closest, scene_trace_shadow

    gpu = build_gpu_scene(random_tri_soup(300, extent=4.0),
                          with_textures=False)
    ts, _levels = build_trace_scene(gpu)
    if not (isinstance(ts.woop, dict) and ts.woop.get("cmin64") is not None):
        # small scenes skip clusters; force the tables so sort engages
        from kajiya_tpu.ops.woop import build_clusters
        from kajiya_tpu.ops.woop_pallas import CULL_TB

        pad = ts.woop["a_o"].size // 12       # (3, T, 4) coefficient rows
        v0, e1, e2 = ts.v0, ts.e1, ts.e2
        ts.woop["cmin64"], ts.woop["cmax64"] = build_clusters(
            v0, e1, e2, pad_to=pad, tri_block=CULL_TB)

    org, d = _rays(2048, seed=11)
    h0 = scene_trace_closest(ts, org, d)
    h1 = scene_trace_closest(ts, org, d, sort=True)
    np.testing.assert_allclose(
        np.where(np.isfinite(np.asarray(h0.t)), np.asarray(h0.t), 0.0),
        np.where(np.isfinite(np.asarray(h1.t)), np.asarray(h1.t), 0.0),
        rtol=2e-5, atol=2e-5)
    assert (np.asarray(h0.tri) == np.asarray(h1.tri)).mean() > 0.999

    occ0 = np.asarray(scene_trace_shadow(ts, org, d))
    occ1 = np.asarray(scene_trace_shadow(ts, org, d, sort=True))
    np.testing.assert_array_equal(occ0, occ1)
