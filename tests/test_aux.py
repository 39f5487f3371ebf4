"""Aux subsystems: checkpoint/resume, profiling, debugging, post passes."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kajiya_tpu.core.checkpoint import load_state, save_state
from kajiya_tpu.core.debugging import check_finite, debug_view
from kajiya_tpu.core.profiling import FrameTimer, pass_scope, time_jitted


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        state = {"a": jnp.ones((4, 4)), "idx": jnp.asarray(3, jnp.int32)}
        p = str(tmp_path / "ck.npz")
        save_state(state, p)
        out = load_state(p, like=state)
        assert np.allclose(np.asarray(out["a"]), 1.0)
        assert int(out["idx"]) == 3

    def test_shape_mismatch_rejected(self, tmp_path):
        state = {"a": jnp.ones((4, 4))}
        p = str(tmp_path / "ck.npz")
        save_state(state, p)
        with pytest.raises(ValueError):
            load_state(p, like={"a": jnp.ones((8, 8))})

    def test_resume_reference_accumulation(self, tmp_path):
        """Checkpoint mid-accumulation and resume: identical result to an
        uninterrupted run (determinism, SURVEY.md section 4e)."""
        from kajiya_tpu.core.camera import make_view_constants
        from kajiya_tpu.frame import (RenderConfig, init_reference_state,
                                      render_frame_reference)
        from kajiya_tpu.scene.procedural import cornell_box
        from kajiya_tpu.scene.scene import build_gpu_scene
        from kajiya_tpu.world import build_trace_scene

        cfg = RenderConfig(width=32, height=24, max_trace_steps=128)
        gpu = build_gpu_scene(cornell_box())
        ts, levels = build_trace_scene(gpu)
        view = make_view_constants((0, 0, 2.4), (0, 0, -1), width=32, height=24)
        step = jax.jit(lambda s: render_frame_reference(
            ts, s, view, cfg, levels=levels, num_bounces=3))

        s = init_reference_state(cfg)
        for _ in range(4):
            s, out_a = step(s)

        s2 = init_reference_state(cfg)
        for _ in range(2):
            s2, _ = step(s2)
        p = str(tmp_path / "pt.npz")
        save_state(s2, p)
        s3 = load_state(p, like=s2)
        for _ in range(2):
            s3, out_b = step(s3)
        np.testing.assert_allclose(np.asarray(out_a["lit"]),
                                   np.asarray(out_b["lit"]), atol=1e-6)


class TestProfiling:
    def test_frame_timer(self):
        t = FrameTimer(window=4)
        for _ in range(6):
            t.tick()
        assert t.dt > 0 and t.fps > 0

    def test_pass_scope_and_timing(self):
        with pass_scope("test pass"):
            x = jnp.ones((8, 8)) * 2
        f = jax.jit(lambda a: a * 3)
        ms = time_jitted(f, x, iters=3, warmup=1)
        assert ms >= 0.0


class TestDebugging:
    def test_check_finite_flags_nan(self):
        st = {"good": jnp.ones((2,)), "bad": jnp.asarray([1.0, jnp.nan])}
        assert check_finite(st) == ["bad"]

    def test_debug_view_shapes(self):
        outs = {"final": jnp.zeros((8, 8, 3)),
                "ssao": jnp.ones((8, 8)),
                "shadow": jnp.zeros((8, 8))}
        img = debug_view(outs, "ssao")
        assert img.shape == (8, 8, 3)
        assert debug_view(outs, None).shape == (8, 8, 3)


class TestPostPasses:
    def test_motion_blur_static_is_identity_ish(self):
        from kajiya_tpu.renderers.motion_blur import motion_blur

        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
        vel = jnp.zeros((64, 64, 2))
        depth = jnp.full((64, 64), 0.5)
        out = motion_blur(img, vel, depth)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)

    def test_motion_blur_blurs_moving(self):
        from kajiya_tpu.renderers.motion_blur import motion_blur

        img = jnp.zeros((64, 64, 3)).at[:, 32, :].set(1.0)
        vel = jnp.full((64, 64, 2), jnp.asarray([0.2, 0.0]))
        depth = jnp.full((64, 64), 0.5)
        out = np.asarray(motion_blur(img, vel, depth))
        assert (out[:, 30] > 0.01).any()  # line smeared sideways

    def test_dof_blurs_defocus(self):
        from kajiya_tpu.renderers.dof import dof_gather

        img = jnp.zeros((64, 64, 3)).at[32, 32, :].set(1.0)
        depth = jnp.full((64, 64), 0.01 / 5.0)   # vz = 5, focus at 1
        out = np.asarray(dof_gather(img, depth, focus_dist=1.0, aperture=8.0))
        assert out[32, 32, 0] < 1.0
        assert (out[30:35, 30:35, 0] > 0).sum() > 3

    def test_cas_preserves_flat_regions(self):
        from kajiya_tpu.renderers.post import cas_sharpen

        flat = jnp.full((32, 32, 3), 0.5)
        out = np.asarray(cas_sharpen(flat))
        np.testing.assert_allclose(out, 0.5, atol=1e-4)
