"""Irradiance cache: allocation, compaction, SH math, frame integration."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kajiya_tpu.renderers import ircache as irc
from kajiya_tpu.renderers.ircache import IrcacheConfig


def tiny_cfg(**kw):
    d = dict(cascades=2, grid_res=8, max_entries=64, rays_per_entry=2,
             base_cell_size=0.5, expire_frames=4)
    d.update(kw)
    return IrcacheConfig(**d)


EYE = jnp.zeros((3,), jnp.float32)


class TestAllocation:
    def test_allocates_unique_cells(self):
        cfg = tiny_cfg()
        st = irc.init_state(cfg)
        # 8 queries in 2 distinct cells
        q = jnp.array([[0.1, 0.1, 0.1]] * 4 + [[1.1, 0.1, 0.1]] * 4, jnp.float32)
        mask = jnp.ones((8,), bool)
        grid = irc.build_grid(st, EYE, cfg)
        st = irc.allocate(st, grid, q, mask, EYE, 0, cfg)
        assert int(np.asarray(st["ircache_valid"]).sum()) == 2

    def test_existing_entry_not_reallocated(self):
        cfg = tiny_cfg()
        st = irc.init_state(cfg)
        q = jnp.array([[0.1, 0.1, 0.1]], jnp.float32)
        mask = jnp.ones((1,), bool)
        for f in range(3):
            grid = irc.build_grid(st, EYE, cfg)
            st = irc.allocate(st, grid, q, mask, EYE, f, cfg)
        assert int(np.asarray(st["ircache_valid"]).sum()) == 1

    def test_expiry_recycles_slots(self):
        cfg = tiny_cfg(max_entries=4)
        st = irc.init_state(cfg)
        q0 = jnp.array([[0.1, 0.1, 0.1]], jnp.float32)
        mask = jnp.ones((1,), bool)
        grid = irc.build_grid(st, EYE, cfg)
        st = irc.allocate(st, grid, q0, mask, EYE, 0, cfg)
        # far in the future, a different cell is queried; old entry expires
        q1 = jnp.array([[1.6, 0.1, 0.1]], jnp.float32)
        grid = irc.build_grid(st, EYE, cfg)
        st = irc.allocate(st, grid, q1, mask, EYE, 100, cfg)
        v = np.asarray(st["ircache_valid"])
        pos = np.asarray(st["ircache_pos"])[v]
        assert v.sum() == 1
        assert np.allclose(pos[0], [1.6, 0.1, 0.1], atol=1e-5)

    def test_capacity_bounded(self):
        cfg = tiny_cfg(max_entries=4)
        st = irc.init_state(cfg)
        # 16 distinct cells requested, only 4 slots
        xs = np.linspace(-1.8, 1.8, 16).astype(np.float32)
        q = jnp.asarray(np.stack([xs, np.full(16, 0.1), np.full(16, 0.1)], -1))
        grid = irc.build_grid(st, EYE, cfg)
        st = irc.allocate(st, grid, q, jnp.ones((16,), bool), EYE, 0, cfg)
        assert int(np.asarray(st["ircache_valid"]).sum()) == 4


class TestCascades:
    def test_cascade_assignment(self):
        cfg = tiny_cfg()
        pos = jnp.array([[0.1, 0, 0], [3.0, 0, 0]], jnp.float32)
        cas, in_range = irc._cascade_of(pos, EYE, cfg)
        assert int(cas[0]) == 0
        assert int(cas[1]) == 1
        # cascade 1 of base 0.5 x res 8 covers |d| < 4
        far = jnp.array([[9.0, 0, 0]], jnp.float32)
        _, ir2 = irc._cascade_of(far, EYE, cfg)
        assert not bool(ir2[0])


class TestSh:
    def test_uniform_radiance_gives_uniform_irradiance(self):
        """Furnace property: probe in a uniform-radiance field L must report
        E/pi == L for any normal."""
        cfg = tiny_cfg(max_entries=8)
        st = irc.init_state(cfg)
        L = 0.7
        # hand-build a single entry with SH of a uniform field:
        # L00 = L * Y00 * 4pi? projection: L_00 = \int L Y00 = L * Y00 * 4pi
        sh = np.zeros((8, 3, 4), np.float32)
        sh[0, :, 0] = L * irc._Y00 * 4 * np.pi
        st["ircache_sh"] = jnp.asarray(sh)
        st["ircache_pos"] = st["ircache_pos"].at[0].set(jnp.array([0.1, 0.1, 0.1]))
        st["ircache_valid"] = st["ircache_valid"].at[0].set(True)
        st["ircache_life"] = st["ircache_life"].at[0].set(32.0)
        dummy_env = jnp.zeros((16, 16, 3), jnp.float32)
        for n in ([0, 1, 0], [1, 0, 0], [0, 0, -1]):
            e = irc.lookup_irradiance(
                st, None, jnp.array([[0.1, 0.1, 0.1]], jnp.float32),
                jnp.array([n], jnp.float32), EYE, dummy_env, cfg)
            # E(n) = pi * L for uniform field; we return E/pi = L
            assert np.allclose(np.asarray(e)[0], L, rtol=2e-2), (n, np.asarray(e))

    def test_lookup_falls_back_to_sky(self):
        cfg = tiny_cfg()
        st = irc.init_state(cfg)
        env = jnp.full((16, 16, 3), 0.25, jnp.float32)
        e = irc.lookup_irradiance(
            st, None, jnp.array([[0.1, 0.1, 0.1]], jnp.float32),
            jnp.array([[0, 1, 0]], jnp.float32), EYE, env, cfg)
        assert np.allclose(np.asarray(e), 0.25, atol=1e-5)


class TestTraceIntegration:
    def test_cache_converges_in_emissive_box(self):
        """Entries inside the cornell box should accumulate positive
        irradiance from the area light after a few updates."""
        from kajiya_tpu.scene.procedural import cornell_box
        from kajiya_tpu.scene.scene import build_gpu_scene
        from kajiya_tpu.sky.env import build_sky_env, convolve_diffuse
        from kajiya_tpu.world import build_trace_scene

        cfg = tiny_cfg(max_entries=16, rays_per_entry=8)
        gpu = build_gpu_scene(cornell_box())
        ts, _ = build_trace_scene(gpu)
        sky = build_sky_env(gpu.sun_direction, 32)
        dif = convolve_diffuse(sky, 8)

        st = irc.init_state(cfg)
        q = jnp.array([[0.0, -0.9, 0.0], [0.4, 0.0, 0.6]], jnp.float32)
        mask = jnp.ones((2,), bool)

        @jax.jit
        def step(st, f):
            grid = irc.build_grid(st, EYE, cfg)
            st = irc.allocate(st, grid, q, mask, EYE, f, cfg)
            return irc.trace_update(st, ts, sky, dif, EYE, f, cfg,
                                    max_trace_steps=256)

        for f in range(6):
            st = step(st, f)
        v = np.asarray(st["ircache_valid"])
        assert v.sum() >= 2
        sh0 = np.asarray(st["ircache_sh"])[v][:, :, 0]
        assert (sh0 > 0).all()          # DC term positive: light reached probes
        assert np.isfinite(np.asarray(st["ircache_sh"])).all()
