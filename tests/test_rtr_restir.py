"""RTR ReSTIR: reservoir exchange, estimator consistency, validation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kajiya_tpu.brdf import ggx
from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.frame import RenderConfig, init_frame_state, render_frame
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene

W, H = 64, 48


@pytest.fixture(scope="module")
def setup():
    gpu = build_gpu_scene(cornell_box())
    ts, levels = build_trace_scene(gpu)
    view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                               fov_y_deg=55.0, width=W, height=H)
    return ts, levels, view


def test_pdf_vndf_integrates_to_one():
    """Deterministic spherical-grid check: pdf_vndf integrates to ~1 over
    the sphere (VNDF is a valid solid-angle density)."""
    n = jnp.asarray([0.0, 0.0, 1.0])
    wo = jnp.asarray([np.sin(0.5), 0.0, np.cos(0.5)], dtype=jnp.float32)
    nt, np_ = 1024, 512
    theta = (np.arange(nt) + 0.5) * np.pi / nt
    phi = (np.arange(np_) + 0.5) * 2 * np.pi / np_
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    wi = jnp.asarray(np.stack([np.sin(tt) * np.cos(pp),
                               np.sin(tt) * np.sin(pp),
                               np.cos(tt)], -1).reshape(-1, 3), jnp.float32)
    dw = (np.pi / nt) * (2 * np.pi / np_) * np.sin(tt).reshape(-1)
    for rough in (0.3, 0.5, 0.8):
        pdf = np.asarray(ggx.pdf_vndf(jnp.full((len(wi),), rough),
                                      jnp.broadcast_to(n, wi.shape),
                                      jnp.broadcast_to(wo, wi.shape), wi))
        integral = float((pdf * dw).sum())
        assert abs(integral - 1.0) < 0.05, (rough, integral)


def test_reservoir_state_present_and_updates(setup):
    ts, levels, view = setup
    cfg = RenderConfig(width=W, height=H, max_trace_steps=256)
    state = init_frame_state(cfg)
    assert "rtr_res_W" in state
    step = jax.jit(lambda s: render_frame(ts, s, view, cfg, levels=levels))
    s1, _ = step(state)
    s2, _ = step(s1)
    # reservoirs accumulate samples over frames on hit pixels
    m1 = np.asarray(s1["rtr_res_M"])
    m2 = np.asarray(s2["rtr_res_M"])
    assert m1.max() >= 1.0
    assert m2.max() > m1.max() - 1e-6        # M grows (within clamp)
    assert np.isfinite(np.asarray(s2["rtr_res_W"])).all()


def test_restir_estimator_reduces_to_candidate_when_m1(setup):
    """With a single fresh candidate the RIS estimator must equal the plain
    traced radiance (the docstring's collapse property)."""
    from kajiya_tpu.renderers import rtr as rtr_mod
    from kajiya_tpu.renderers.gbuffer import raytrace_gbuffer
    from kajiya_tpu.renderers.reprojection import calculate_reprojection_map
    from kajiya_tpu.sky import env as sky_env_mod
    from kajiya_tpu.sky.atmosphere import sky_radiance

    ts, levels, view = setup
    gb = jax.jit(lambda: raytrace_gbuffer(ts, view, W, H,
                                          max_trace_steps=256))()
    sun = ts.gpu.sun_direction
    sky = lambda d: sky_radiance(d, sun, steps=6)
    denv = sky_env_mod.sh9_irradiance_fn(
        sky_env_mod.project_sh9(sky_env_mod.build_sky_env(sun, res=16)))

    state = rtr_mod.init_state(H, W)
    reproj = jax.jit(lambda: calculate_reprojection_map(
        gb, jnp.zeros((H, W)), view))()

    def run():
        half = rtr_mod.trace_reflections(ts, gb, 0, sky, denv,
                                         max_trace_steps=256)
        spec, rl, _ = rtr_mod.restir_reflections(state, half, gb, reproj, 0)
        return half, spec

    half, spec = jax.jit(run)()
    rad = np.asarray(half["radiance"])
    spc = np.asarray(spec)
    valid = np.asarray(half["valid"])
    # empty temporal history + invalid reprojection -> estimator == candidate
    np.testing.assert_allclose(spc[valid], rad[valid], rtol=1e-3, atol=1e-4)


def test_validation_kills_stale_reservoirs(setup):
    """Reservoirs whose stored radiance disagrees with a fresh trace are
    replaced on validation frames (frame_idx % 3 == 0)."""
    from kajiya_tpu.renderers import rtr as rtr_mod
    from kajiya_tpu.renderers.gbuffer import raytrace_gbuffer
    from kajiya_tpu.sky import env as sky_env_mod
    from kajiya_tpu.sky.atmosphere import sky_radiance

    ts, levels, view = setup
    gb = jax.jit(lambda: raytrace_gbuffer(ts, view, W, H,
                                          max_trace_steps=256))()
    sun = ts.gpu.sun_direction
    sky = lambda d: sky_radiance(d, sun, steps=6)
    denv = sky_env_mod.sh9_irradiance_fn(
        sky_env_mod.project_sh9(sky_env_mod.build_sky_env(sun, res=16)))

    state = rtr_mod.init_state(H, W)
    # poison the reservoirs with a bogus bright radiance along up-rays
    hh, hw = H // 2, W // 2
    state["rtr_res_radiance"] = jnp.full((hh, hw, 3), 50.0)
    state["rtr_res_dir"] = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0]), (hh, hw, 3))
    state["rtr_res_t"] = jnp.full((hh, hw), 1.0)
    state["rtr_res_M"] = jnp.full((hh, hw), 8.0)
    state["rtr_res_w_sum"] = jnp.full((hh, hw), 50.0 * 8.0)
    state["rtr_res_W"] = jnp.full((hh, hw), 1.0)

    new = jax.jit(lambda s: rtr_mod.validate_reservoirs(
        ts, s, gb, sky, denv, 0, max_trace_steps=256))(state)
    rad_new = np.asarray(new["rtr_res_radiance"])
    m_new = np.asarray(new["rtr_res_M"])
    w_new = np.asarray(new["rtr_res_W"])
    p_new = np.asarray(new["rtr_res_p_hat"])
    ws_new = np.asarray(new["rtr_res_w_sum"])
    valid = np.asarray(gb["hit"])[::2, ::2]
    # the re-traced lanes (top-left of each 2x2) get the fresh payload:
    # the bogus 50.0 radiance cannot survive there
    traced = np.zeros_like(valid)
    traced[::2, ::2] = True
    assert rad_new[valid & traced].max() < 49.0
    # every invalidated lane (traced or neighbor) has its history cut
    assert (m_new[valid] <= 1.0 + 1e-6).all()
    # replaced lanes keep W == w_sum / (M * p_hat) consistent
    repl = valid & traced
    np.testing.assert_allclose(
        w_new[repl], ws_new[repl] / np.maximum(p_new[repl], 1e-8),
        rtol=1e-4)
