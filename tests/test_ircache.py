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


class TestReposition:
    def test_vote_nudges_entry_toward_queries(self):
        """An existing entry drifts toward the cell's winning query point
        (ranked-vote repositioning, `gi-overview.md:270-300`)."""
        cfg = tiny_cfg(reposition_rate=0.5)
        st = irc.init_state(cfg)
        q0 = jnp.array([[0.05, 0.05, 0.05]], jnp.float32)
        mask = jnp.ones((1,), bool)
        grid = irc.build_grid(st, EYE, cfg)
        st = irc.allocate(st, grid, q0, mask, EYE, 0, cfg)
        # same cell, different point: entry should move half-way toward it
        q1 = jnp.array([[0.4, 0.4, 0.4]], jnp.float32)
        grid = irc.build_grid(st, EYE, cfg)
        st = irc.allocate(st, grid, q1, mask, EYE, 1, cfg)
        v = np.asarray(st["ircache_valid"])
        pos = np.asarray(st["ircache_pos"])[v][0]
        assert np.allclose(pos, [0.225, 0.225, 0.225], atol=1e-5), pos
        assert v.sum() == 1      # still the same single entry

    def test_new_entry_not_nudged(self):
        cfg = tiny_cfg(reposition_rate=0.5)
        st = irc.init_state(cfg)
        q = jnp.array([[0.05, 0.05, 0.05]], jnp.float32)
        grid = irc.build_grid(st, EYE, cfg)
        st = irc.allocate(st, grid, q, jnp.ones((1,), bool), EYE, 0, cfg)
        v = np.asarray(st["ircache_valid"])
        pos = np.asarray(st["ircache_pos"])[v][0]
        assert np.allclose(pos, [0.05, 0.05, 0.05], atol=1e-6)


class TestBudget:
    def test_round_robin_covers_all_entries(self):
        """With active_budget < live entries, every live entry is traced
        within ceil(live/budget) frames (life increments only when traced)."""
        from kajiya_tpu.scene.procedural import cornell_box
        from kajiya_tpu.scene.scene import build_gpu_scene
        from kajiya_tpu.sky.env import build_sky_env, convolve_diffuse
        from kajiya_tpu.world import build_trace_scene

        cfg = tiny_cfg(max_entries=8, rays_per_entry=2, active_budget=2)
        gpu = build_gpu_scene(cornell_box())
        ts, _ = build_trace_scene(gpu)
        sky = build_sky_env(gpu.sun_direction, 32)
        dif = convolve_diffuse(sky, 8)

        st = irc.init_state(cfg)
        # 4 live entries in distinct cells
        q = jnp.array([[0.1, -0.9, 0.1], [0.7, -0.9, 0.1],
                       [-0.7, -0.9, 0.1], [0.1, -0.9, 0.7]], jnp.float32)
        grid = irc.build_grid(st, EYE, cfg)
        st = irc.allocate(st, grid, q, jnp.ones((4,), bool), EYE, 0, cfg)
        assert int(np.asarray(st["ircache_valid"]).sum()) == 4

        @jax.jit
        def step(st, f):
            return irc.trace_update(st, ts, sky, dif, EYE, f, cfg,
                                    max_trace_steps=64)

        lives = []
        for f in range(4):
            st = step(st, f)
            lives.append(np.asarray(st["ircache_life"])[
                np.asarray(st["ircache_valid"])])
        # per frame exactly budget=2 of the 4 live entries gain life
        assert np.isclose(lives[0].sum(), 2.0), lives[0]
        # after 2 frames (2 x budget 2 = 4) every entry has been traced once
        assert (lives[1] >= 1.0).all(), lives[1]
        # and coverage keeps cycling evenly
        assert np.isclose(lives[3].sum(), 2.0 * 4), lives[3]


class TestValidation:
    def test_lighting_change_cuts_history(self):
        """Stored-ray re-trace on a validate frame detects a radiance flip
        and resets the entry's hysteresis (life), so the SH re-converges
        fast — `ircache_validate.rgen.hlsl` behavior."""
        cfg = tiny_cfg(max_entries=4, rays_per_entry=4, validate_period=2,
                       hysteresis_frames=32.0)
        st = irc.init_state(cfg)
        st["ircache_valid"] = st["ircache_valid"].at[0].set(True)
        st["ircache_pos"] = st["ircache_pos"].at[0].set(
            jnp.array([0.1, 0.1, 0.1]))
        st["ircache_life"] = st["ircache_life"].at[0].set(30.0)
        # stored rays claim bright radiance along known dirs
        dirs = jnp.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0]],
                         jnp.float32)
        st["ircache_ray_dir"] = st["ircache_ray_dir"].at[0].set(dirs)
        st["ircache_ray_rad"] = st["ircache_ray_rad"].at[0].set(5.0)

        # a black scene: re-trace returns ~0 radiance -> total mismatch
        from kajiya_tpu.scene.procedural import cornell_box
        from kajiya_tpu.scene.scene import build_gpu_scene
        from kajiya_tpu.sky.env import build_sky_env, convolve_diffuse
        from kajiya_tpu.world import build_trace_scene

        scene = cornell_box(light_intensity=0.0)
        gpu = build_gpu_scene(scene)
        ts, _ = build_trace_scene(gpu)
        dark = jnp.zeros((16, 16, 3), jnp.float32)

        # frame 2 is a validate frame (2 % 2 == 0)
        st2 = irc.trace_update(st, ts, dark, dark, EYE, 2, cfg,
                               max_trace_steps=64)
        life = float(np.asarray(st2["ircache_life"])[0])
        assert life <= 3.0 + 1e-5, life     # cut to <=2 then +1

        # a NON-validate frame with the same mismatch leaves history alone
        st3 = irc.trace_update(st, ts, dark, dark, EYE, 3, cfg,
                               max_trace_steps=64)
        life3 = float(np.asarray(st3["ircache_life"])[0])
        assert life3 >= 30.0, life3

    def test_unchanged_lighting_keeps_history(self):
        """Validate frame with consistent radiance must NOT cut life."""
        from kajiya_tpu.scene.procedural import cornell_box
        from kajiya_tpu.scene.scene import build_gpu_scene
        from kajiya_tpu.sky.env import build_sky_env, convolve_diffuse
        from kajiya_tpu.world import build_trace_scene

        cfg = tiny_cfg(max_entries=4, rays_per_entry=4, validate_period=2,
                       hysteresis_frames=32.0)
        gpu = build_gpu_scene(cornell_box())
        ts, _ = build_trace_scene(gpu)
        sky = build_sky_env(gpu.sun_direction, 32)
        dif = convolve_diffuse(sky, 8)

        st = irc.init_state(cfg)
        st["ircache_valid"] = st["ircache_valid"].at[0].set(True)
        st["ircache_pos"] = st["ircache_pos"].at[0].set(
            jnp.array([0.0, -0.5, 0.0]))
        st["ircache_life"] = st["ircache_life"].at[0].set(20.0)
        # prime stored rays on a non-validate frame (frame 1)
        st = irc.trace_update(st, ts, sky, dif, EYE, 1, cfg,
                              max_trace_steps=128)
        # validate frame re-traces the same static scene: no cut
        st = irc.trace_update(st, ts, sky, dif, EYE, 2, cfg,
                              max_trace_steps=128)
        life = float(np.asarray(st["ircache_life"])[0])
        assert life >= 22.0 - 1e-5, life


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


class TestWorldExtent:
    def test_default_cascade_count_matches_reference(self):
        # `frame_constants.rs:4` IRCACHE_CASCADE_COUNT = 12
        assert IrcacheConfig().cascades == 12

    def test_far_surface_allocates_in_outer_cascade(self):
        # A surface ~600 units out needs cascade >= 8 (half extent at the
        # default base_cell_size 0.25 is 4 * 2^c); 8 cascades covered only
        # +-512 — the reference's 12 reach +-8192 (battle.ron-class worlds).
        cfg = IrcacheConfig(max_entries=64)
        st = irc.init_state(cfg)
        q = jnp.array([[600.0, 0.0, 0.0]], jnp.float32)
        mask = jnp.ones((1,), bool)
        grid = irc.build_grid(st, EYE, cfg)
        st = irc.allocate(st, grid, q, mask, EYE, 0, cfg)
        assert int(np.asarray(st["ircache_valid"]).sum()) == 1
        casc, in_range = irc._cascade_of(q, EYE, cfg)
        assert bool(np.asarray(in_range)[0])
        assert int(np.asarray(casc)[0]) >= 8
