"""End-to-end hybrid frame tests (the 'hello' milestone of SURVEY.md section 7:
raster + sky + lighting + post on a small scene)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.frame import RenderConfig, Renderer, init_frame_state, jitter_for_frame, render_frame
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene

W, H = 64, 48


@pytest.fixture(scope="module")
def cornell_setup():
    scene = cornell_box()
    gpu = build_gpu_scene(scene)
    ts, levels = build_trace_scene(gpu)
    view = make_view_constants(
        position=(0.0, 0.0, 2.4), forward=(0.0, 0.0, -1.0),
        fov_y_deg=55.0, width=W, height=H)
    return ts, levels, view


def small_cfg(**kw):
    defaults = dict(width=W, height=H, max_trace_steps=512)
    defaults.update(kw)
    return RenderConfig(**defaults)


class TestRenderFrame:
    def test_full_frame_runs_and_is_finite(self, cornell_setup):
        ts, levels, view = cornell_setup
        cfg = small_cfg()
        state = init_frame_state(cfg)
        state, out = jax.jit(
            lambda s: render_frame(ts, s, view, cfg, levels=levels))(state)
        final = np.asarray(out["final"])
        assert final.shape == (H, W, 3)
        assert np.all(np.isfinite(final))
        assert final.min() >= 0.0 and final.max() <= 1.0
        # interior should not be black: light + GI active
        assert final.mean() > 0.01
        assert int(state["frame_idx"]) == 1

    def test_temporal_state_advances(self, cornell_setup):
        ts, levels, view = cornell_setup
        cfg = small_cfg()
        state = init_frame_state(cfg)
        fn = jax.jit(lambda s: render_frame(ts, s, view, cfg, levels=levels))
        state, out0 = fn(state)
        state, out1 = fn(state)
        state, out2 = fn(state)
        # shadow/GI history lengths grow
        assert float(state["history_len"].max()) >= 2.0
        assert float(state["rtdgi_hist_len"].max()) >= 2.0
        assert np.all(np.isfinite(np.asarray(out2["final"])))

    def test_gbuffer_consistency(self, cornell_setup):
        ts, levels, view = cornell_setup
        from kajiya_tpu.renderers.gbuffer import raytrace_gbuffer

        gb = jax.jit(lambda: raytrace_gbuffer(ts, view, W, H))()
        hit = np.asarray(gb["hit"])
        assert hit.mean() > 0.8          # cornell interior covers most pixels
        d = np.asarray(gb["depth"])
        assert (d[hit] > 0).all()
        n = np.asarray(gb["normal"])[hit]
        assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-3)
        # static scene + static camera -> zero velocity
        assert np.abs(np.asarray(gb["velocity"])[hit]).max() < 1e-4

    def test_debug_modes(self, cornell_setup):
        ts, levels, view = cornell_setup
        cfg = small_cfg(debug_mode="albedo", use_taa=False)
        state = init_frame_state(cfg)
        _, out = jax.jit(
            lambda s: render_frame(ts, s, view, cfg, levels=levels))(state)
        assert np.all(np.isfinite(np.asarray(out["final"])))

    def test_renderer_wrapper(self):
        scene = cornell_box()
        r = Renderer(scene, small_cfg())
        view = make_view_constants((0, 0, 2.4), (0, 0, -1), width=W, height=H,
                                   jitter=np.asarray(r.jitter()))
        out = r.draw(view)
        assert np.asarray(out["final"]).shape == (H, W, 3)
        out2 = r.draw(view)
        assert int(r.state["frame_idx"]) == 2


class TestJitter:
    def test_jitter_sequence_bounded_and_varied(self):
        j = np.stack([np.asarray(jitter_for_frame(i)) for i in range(16)])
        assert (np.abs(j) <= 0.5).all()
        assert len(np.unique(j.round(4), axis=0)) == 16


class TestWrc:
    def test_wrc_lookup_bound_in_hit_lighting(self, cornell_setup):
        """`use_wrc` exercises wrc.lookup inside hit lighting: far-field
        hits (t > wrc_min_t) must return the probe radiance (the
        reference's bound-interface contract, world_render_passes.rs:101-111)."""
        import jax.numpy as jnp

        from kajiya_tpu.renderers.hit_lighting import hit_radiance
        from kajiya_tpu.renderers import wrc as wrc_mod
        from kajiya_tpu.rt.trace import scene_trace_closest
        from kajiya_tpu.sky.atmosphere import sky_radiance
        from kajiya_tpu.sky import env as sky_env_mod

        ts, levels, view = cornell_setup
        wcfg = wrc_mod.WrcConfig(grid=(2, 1, 2), probe_res=8)
        st = wrc_mod.init_state(wcfg)
        st = {"wrc_atlas": st["wrc_atlas"] + 7.5}     # sentinel radiance

        sun = ts.gpu.sun_direction
        sky_env = lambda d: sky_radiance(d, sun, steps=6)    # noqa: E731
        small = sky_env_mod.build_sky_env(sun, res=16)
        diffuse_env = sky_env_mod.sh9_irradiance_fn(
            sky_env_mod.project_sh9(small))

        org = jnp.array([[0.0, 0.0, 0.0]] * 2, jnp.float32)
        d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]], jnp.float32)
        hit = scene_trace_closest(ts, org, d, max_steps=256)
        rad = hit_radiance(
            ts, hit, d, sky_env, diffuse_env,
            wrc_lookup=lambda p, dd: wrc_mod.lookup(st, wcfg, p, dd),
            wrc_min_t=0.0)   # every hit is "far": must come from the probes
        rad = np.asarray(rad)
        hm = np.asarray(hit.hit_mask)
        assert hm.any()
        assert np.allclose(rad[hm], 7.5, atol=1e-5)

    def test_frame_with_wrc_enabled(self, cornell_setup):
        from kajiya_tpu.renderers.wrc import WrcConfig

        ts, levels, view = cornell_setup
        cfg = small_cfg(use_wrc=True, use_ircache=False,
                        use_restir_gi=False, use_motion_blur=False,
                        wrc=WrcConfig(grid=(2, 1, 2), probe_res=8))
        state = init_frame_state(cfg)
        assert "wrc_atlas" in state
        state, out = jax.jit(
            lambda s: render_frame(ts, s, view, cfg, levels=levels))(state)
        assert np.all(np.isfinite(np.asarray(out["final"])))
        # probes saw the lit box: the atlas must no longer be all zeros
        assert float(np.abs(np.asarray(state["wrc_atlas"])).max()) > 0.0

    def test_frame_with_dof_enabled(self, cornell_setup):
        """DoF is opt-in (reference parity: `world_render_passes.rs:250` is
        commented out there). Enabled, the frame must stay finite and a
        defocused region must differ from the no-DoF frame."""
        ts, levels, view = cornell_setup
        base = dict(use_ircache=False, use_restir_gi=False, use_rtr=False,
                    use_motion_blur=False, use_taa=False)
        cfg0 = small_cfg(**base)
        cfg1 = small_cfg(use_dof=True, dof_focus_dist=1.0, dof_aperture=8.0,
                         **base)
        s0, out0 = jax.jit(lambda s: render_frame(
            ts, s, view, cfg0, levels=levels))(init_frame_state(cfg0))
        s1, out1 = jax.jit(lambda s: render_frame(
            ts, s, view, cfg1, levels=levels))(init_frame_state(cfg1))
        a, b = np.asarray(out0["final"]), np.asarray(out1["final"])
        assert np.all(np.isfinite(b))
        assert np.abs(a - b).max() > 1e-3
