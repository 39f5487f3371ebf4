"""Multi-chip sharding (8 virtual CPU devices via conftest)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kajiya_tpu.core.camera import camera_rays, make_view_constants
from kajiya_tpu.frame import RenderConfig, init_frame_state
from kajiya_tpu.parallel import make_mesh, render_frame_sharded, shard_rays_pt
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene

N_DEV = 8


@pytest.fixture(scope="module")
def setup():
    gpu = build_gpu_scene(cornell_box())
    ts, levels = build_trace_scene(gpu)
    return ts, levels


class TestTileSharding:
    def test_sharded_frame_matches_single_device(self, setup):
        ts, levels = setup
        h, w = 16 * N_DEV, 64
        cfg = RenderConfig(width=w, height=h, max_trace_steps=256,
                           use_motion_blur=False)
        view = make_view_constants((0, 0, 2.4), (0, 0, -1), fov_y_deg=55.0,
                                   width=w, height=h)
        mesh = make_mesh(N_DEV)
        state = init_frame_state(cfg)
        new_state, out = render_frame_sharded(
            ts, state, view, cfg, levels, mesh)
        sharded = np.asarray(out["final"])

        from kajiya_tpu.frame import render_frame

        state2 = init_frame_state(cfg)
        _, out2 = jax.jit(lambda s: render_frame(
            ts, s, view, cfg, levels=levels))(state2)
        single = np.asarray(out2["final"])
        assert sharded.shape == single.shape
        # identical rng streams -> near-identical output across shardings
        np.testing.assert_allclose(sharded, single, atol=2e-2)

    def test_state_stays_sharded(self, setup):
        ts, levels = setup
        h, w = 16 * N_DEV, 64
        cfg = RenderConfig(width=w, height=h, max_trace_steps=128,
                           use_motion_blur=False)
        view = make_view_constants((0, 0, 2.4), (0, 0, -1), width=w, height=h)
        mesh = make_mesh(N_DEV)
        state = init_frame_state(cfg)
        new_state, _ = render_frame_sharded(ts, state, view, cfg, levels, mesh)
        assert np.isfinite(np.asarray(new_state["prev_lit"])).all()


class TestShardingQuality:
    def test_no_full_plane_all_gathers(self, setup):
        """VERDICT r4 #10: compile the 8-device GSPMD frame and assert the
        optimized HLO's cross-chip traffic is halo-shaped — no collective
        moves a full frame plane. Row-sharded planes + replicated scene
        should need only boundary-row collective-permutes and small
        reductions (histogram/exposure); a plane-sized all-gather means the
        partitioner replicated a pass instead of sharding it."""
        from kajiya_tpu.parallel.mesh import (check_sharding_quality,
                                              compile_frame_sharded)

        ts, levels = setup
        h, w = 16 * N_DEV, 64
        cfg = RenderConfig(width=w, height=h, max_trace_steps=256,
                           use_motion_blur=False)
        view = make_view_constants((0, 0, 2.4), (0, 0, -1), fov_y_deg=55.0,
                                   width=w, height=h)
        mesh = make_mesh(N_DEV)
        compiled = compile_frame_sharded(
            ts, init_frame_state(cfg), view, cfg, levels, mesh)
        summary, problems = check_sharding_quality(compiled, h, w)
        assert not problems, problems
        # the halo traffic itself must exist (screen-space filters read
        # neighbor rows across shard boundaries)
        assert "collective-permute" in summary or "all-to-all" in summary, (
            summary)
        # halo permutes stay boundary-sized (well under one frame plane)
        assert summary["collective-permute"]["max_bytes"] < h * w * 4, (
            summary)


class TestSampleSharding:
    def test_spp_sharded_pt_matches_single(self, setup):
        ts, _ = setup
        w, h = 64, 16 * N_DEV
        view = make_view_constants((0, 0, 2.4), (0, 0, -1), width=w, height=h)
        org, d = camera_rays(view, w, h)
        seed = jnp.arange(w * h, dtype=jnp.uint32)
        mesh = make_mesh(N_DEV)
        rad_sh = np.asarray(shard_rays_pt(
            ts, org.reshape(-1, 3), d.reshape(-1, 3), seed, mesh,
            num_bounces=2, max_trace_steps=256))

        from kajiya_tpu.renderers.reference import path_trace

        rad_single = np.asarray(jax.jit(lambda: path_trace(
            ts, org.reshape(-1, 3), d.reshape(-1, 3), seed,
            num_bounces=2, max_trace_steps=256))())
        np.testing.assert_allclose(rad_sh, rad_single, atol=1e-4)


class TestMultihost:
    def test_multihost_mesh_frame_matches_single_device(self, setup):
        """(2 hosts x 4 chips) emulated on the virtual pool: host-major row
        sharding across both axes must be numerically identical to the
        single-device render."""
        from kajiya_tpu.parallel import (distribute_scene,
                                         make_multihost_mesh,
                                         render_frame_multihost)

        ts, levels = setup
        ts = distribute_scene(ts)           # single-process: identity
        h, w = 16 * N_DEV, 64
        cfg = RenderConfig(width=w, height=h, max_trace_steps=256,
                           use_motion_blur=False)
        view = make_view_constants((0, 0, 2.4), (0, 0, -1), fov_y_deg=55.0,
                                   width=w, height=h)
        mesh = make_multihost_mesh(shape=(2, 4))
        assert mesh.shape == {"host": 2, "tile": 4}
        state = init_frame_state(cfg)
        _, out = render_frame_multihost(ts, state, view, cfg, levels, mesh)
        sharded = np.asarray(out["final"])

        from kajiya_tpu.frame import render_frame

        state2 = init_frame_state(cfg)
        _, out2 = jax.jit(
            lambda s: render_frame(ts, s, view, cfg, levels=levels))(state2)
        single = np.asarray(out2["final"])
        assert np.allclose(sharded, single, atol=2e-3), (
            np.abs(sharded - single).max())

    def test_multihost_state_row_sharded(self, setup):
        from kajiya_tpu.parallel import (make_multihost_mesh,
                                         render_frame_multihost)

        ts, levels = setup
        h, w = 16 * N_DEV, 64
        cfg = RenderConfig(width=w, height=h, max_trace_steps=256,
                           use_motion_blur=False)
        view = make_view_constants((0, 0, 2.4), (0, 0, -1), fov_y_deg=55.0,
                                   width=w, height=h)
        mesh = make_multihost_mesh(shape=(2, 4))
        state = init_frame_state(cfg)
        new_state, _ = render_frame_multihost(ts, state, view, cfg, levels,
                                              mesh)
        lit = new_state["prev_lit"] if "prev_lit" in new_state else None
        # find any (H, W, ...) plane and check it is sharded over 8 shards
        for k, v in new_state.items():
            if hasattr(v, "ndim") and v.ndim >= 2 and v.shape[0] == h:
                assert len(v.sharding.device_set) == N_DEV, k
                break
        else:
            raise AssertionError("no frame plane found")
