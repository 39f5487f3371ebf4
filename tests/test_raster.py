"""Software rasterizer: exact parity with the traced g-buffer + binning
correctness (the 'raster simple' / RTX-off primary path)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.renderers import raster as rast
from kajiya_tpu.renderers.gbuffer import raster_gbuffer, raytrace_gbuffer
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene

W, H = 128, 64


@pytest.fixture(scope="module")
def setup():
    gpu = build_gpu_scene(cornell_box())
    ts, levels = build_trace_scene(gpu)
    view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                               fov_y_deg=55.0, width=W, height=H)
    return ts, view


class TestScreenRects:
    def test_box_in_front_projects_inside(self, setup):
        ts, view = setup
        bmin = jnp.array([[-0.2, -0.2, -1.2]], jnp.float32)
        bmax = jnp.array([[0.2, 0.2, -0.8]], jnp.float32)
        r = np.asarray(rast._block_screen_rects(bmin, bmax, view, W, H))[0]
        assert 0 < r[0] < r[2] < W
        assert 0 < r[1] < r[3] < H

    def test_box_behind_eye_is_dropped(self, setup):
        ts, view = setup
        bmin = jnp.array([[-0.2, -0.2, 3.0]], jnp.float32)   # eye at z=2.4
        bmax = jnp.array([[0.2, 0.2, 3.4]], jnp.float32)
        r = np.asarray(rast._block_screen_rects(bmin, bmax, view, W, H))[0]
        assert r[0] > r[2]    # empty rect

    def test_box_crossing_eye_plane_is_fullscreen(self, setup):
        ts, view = setup
        bmin = jnp.array([[-0.2, -0.2, 2.0]], jnp.float32)
        bmax = jnp.array([[0.2, 0.2, 3.0]], jnp.float32)
        r = np.asarray(rast._block_screen_rects(bmin, bmax, view, W, H))[0]
        assert r[0] <= 0 and r[1] <= 0 and r[2] >= W and r[3] >= H

    def test_empty_block_is_dropped(self, setup):
        ts, view = setup
        bmin = jnp.array([[np.inf] * 3], jnp.float32)
        bmax = jnp.array([[-np.inf] * 3], jnp.float32)
        r = np.asarray(rast._block_screen_rects(bmin, bmax, view, W, H))[0]
        assert r[0] > r[2]


class TestRasterParity:
    def test_hits_match_trace_exactly(self, setup):
        """Same intersector + conservative binning => identical hits."""
        ts, view = setup
        hit_r = jax.jit(lambda: rast.raster_hit(ts, view, W, H,
                                                max_trace_steps=256))()
        from kajiya_tpu.core.camera import camera_rays
        from kajiya_tpu.rt.trace import scene_trace_closest

        org, d = camera_rays(view, W, H)
        hit_t = jax.jit(lambda: scene_trace_closest(
            ts, org.reshape(-1, 3), d.reshape(-1, 3), max_steps=256))()
        assert np.array_equal(np.asarray(hit_r.tri), np.asarray(hit_t.tri))
        np.testing.assert_allclose(np.asarray(hit_r.t)[np.asarray(hit_t.tri) >= 0],
                                   np.asarray(hit_t.t)[np.asarray(hit_t.tri) >= 0],
                                   rtol=1e-6)

    def test_gbuffer_parity(self, setup):
        ts, view = setup
        gb_r = jax.jit(lambda: raster_gbuffer(ts, view, W, H,
                                              max_trace_steps=256))()
        gb_t = jax.jit(lambda: raytrace_gbuffer(ts, view, W, H,
                                                max_trace_steps=256))()
        for k in ("depth", "albedo", "normal", "velocity"):
            np.testing.assert_allclose(np.asarray(gb_r[k]),
                                       np.asarray(gb_t[k]), atol=1e-6,
                                       err_msg=k)
        assert np.asarray(gb_r["hit"]).sum() > 0.5 * W * H   # mostly walls


class TestRasterFrame:
    def test_frame_runs_in_raster_mode(self, setup):
        from kajiya_tpu.frame import RenderConfig, init_frame_state, render_frame

        ts, view = setup
        cfg = RenderConfig(width=W, height=H, primary="raster",
                           max_trace_steps=256, use_ircache=False,
                           use_restir_gi=False, use_motion_blur=False)
        state = init_frame_state(cfg)
        state, out = jax.jit(lambda s: render_frame(ts, s, view, cfg))(state)
        img = np.asarray(out["final"])
        assert np.isfinite(img).all() and img.mean() > 0.01


class TestBinnedParity:
    """Above the cluster threshold the raster path actually bins; hits must
    still match the (unbinned) brute trace exactly."""

    def test_binned_scene_parity(self):
        from kajiya_tpu.core.camera import camera_rays
        from kajiya_tpu.rt.trace import scene_trace_closest
        from kajiya_tpu.scene.procedural import random_tri_soup

        gpu = build_gpu_scene(random_tri_soup(9000, seed=3))
        ts, levels = build_trace_scene(gpu)
        assert ts.woop is not None and ts.woop.get("cmin") is not None
        view = make_view_constants((0.0, 0.0, 18.0), (0.0, 0.0, -1.0),
                                   fov_y_deg=55.0, width=W, height=H)
        hit_r = jax.jit(lambda: rast.raster_hit(ts, view, W, H))()
        org, d = camera_rays(view, W, H)
        hit_t = jax.jit(lambda: scene_trace_closest(
            ts, org.reshape(-1, 3), d.reshape(-1, 3)))()
        tri_r, tri_t = np.asarray(hit_r.tri), np.asarray(hit_t.tri)
        assert (tri_t >= 0).sum() > 100          # the soup is visible
        assert np.array_equal(tri_r, tri_t)
