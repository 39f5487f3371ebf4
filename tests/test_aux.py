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


class TestHotReload:
    def test_watcher_reloads_edited_module(self, tmp_path):
        """Edit a watched module -> poll() reloads it and new code is live
        (the shader hot-reload analog, core/reload.py)."""
        import sys
        import time

        pkg = tmp_path / "hotpkg"
        pkg.mkdir()
        (pkg / "__init__.py").write_text("")
        (pkg / "leaf.py").write_text("VALUE = 1\n")
        sys.path.insert(0, str(tmp_path))
        try:
            import hotpkg.leaf as leaf

            from kajiya_tpu.core.reload import ModuleWatcher

            w = ModuleWatcher(package="hotpkg")
            assert w.poll() == []                 # nothing edited
            time.sleep(0.05)
            (pkg / "leaf.py").write_text("VALUE = 2\n")
            os_utime_bump = (pkg / "leaf.py")
            import os as _os
            _os.utime(os_utime_bump, (time.time() + 2, time.time() + 2))
            changed = w.poll()
            assert "hotpkg.leaf" in changed
            assert leaf.VALUE == 2                # reload updated in place
        finally:
            sys.path.remove(str(tmp_path))
            for m in [m for m in sys.modules if m.startswith("hotpkg")]:
                del sys.modules[m]

    def test_watcher_survives_broken_edit(self, tmp_path):
        import sys
        import time
        import os as _os

        pkg = tmp_path / "hotpkg2"
        pkg.mkdir()
        (pkg / "__init__.py").write_text("")
        (pkg / "leaf.py").write_text("VALUE = 1\n")
        sys.path.insert(0, str(tmp_path))
        try:
            import hotpkg2.leaf as leaf

            from kajiya_tpu.core.reload import ModuleWatcher

            w = ModuleWatcher(package="hotpkg2")
            (pkg / "leaf.py").write_text("VALUE = (\n")    # syntax error
            _os.utime(pkg / "leaf.py", (time.time() + 2, time.time() + 2))
            assert w.poll() == []                  # reported, not reloaded
            assert leaf.VALUE == 1                 # old code still live
        finally:
            sys.path.remove(str(tmp_path))
            for m in [m for m in sys.modules if m.startswith("hotpkg2")]:
                del sys.modules[m]

    def test_renderer_rebuild_preserves_state_and_output(self):
        """rebuild() re-traces but FrameState carries over: a run with a
        mid-stream rebuild is bit-identical to an uninterrupted one."""
        import jax
        import numpy as np
        from kajiya_tpu.core.camera import make_view_constants
        from kajiya_tpu.frame import RenderConfig, Renderer
        from kajiya_tpu.scene.procedural import cornell_box

        cfg = RenderConfig(width=32, height=24, max_trace_steps=64,
                           use_taa=False, use_motion_blur=False,
                           use_ircache=False, use_rtr=False)
        view = make_view_constants((0, 0, 2.4), (0, 0, -1), width=32,
                                   height=24)

        r1 = Renderer(cornell_box(), cfg)
        a = r1.draw(view)
        r1.rebuild()                               # jit invalidation
        a2 = r1.draw(view)

        r2 = Renderer(cornell_box(), cfg)
        b = r2.draw(view)
        b2 = r2.draw(view)
        np.testing.assert_allclose(np.asarray(a2["final"]),
                                   np.asarray(b2["final"]), atol=1e-6)


class TestDisplayTransform:
    def test_neutral_stays_neutral_and_reaches_white(self):
        from kajiya_tpu.renderers.post import tonemap_filmic

        g = jnp.repeat(jnp.asarray([0.0, 0.18, 1.0, 20.0, 1e4])[:, None], 3, 1)
        out = np.asarray(tonemap_filmic(g))
        assert np.isfinite(out).all()
        # neutral in -> neutral out
        assert np.abs(out - out.mean(-1, keepdims=True)).max() < 2e-2
        assert out[0].max() < 1e-5              # black stays black
        assert out[-1].min() > 0.97             # hot whites reach ~1
        # monotone in luminance
        assert (np.diff(out.mean(-1)) > -1e-6).all()

    def test_bright_saturated_desaturates(self):
        """Path-to-white: a hot pure red must gain G/B (desaturate toward
        white) while a dim red stays saturated — the behavior the
        notorious6 chroma attenuation exists for."""
        from kajiya_tpu.renderers.post import tonemap_filmic

        reds = jnp.asarray([[0.2, 0.0, 0.0], [50.0, 0.0, 0.0]])
        out = np.asarray(tonemap_filmic(reds))
        sat = lambda c: (c.max() - c.min()) / max(c.max(), 1e-6)
        assert sat(out[0]) > 0.9                # dim: still pure red
        assert sat(out[1]) < 0.65, out[1]       # hot: pulled toward white
        assert out[1, 0] > out[1, 1] >= 0.0     # but hue ordering kept

    def test_hue_preserved_midrange(self):
        from kajiya_tpu.renderers.post import tonemap_filmic

        c = jnp.asarray([[0.4, 0.2, 0.1]])
        out = np.asarray(tonemap_filmic(c))[0]
        assert out[0] > out[1] > out[2] > 0.0
        assert (out >= 0).all() and (out <= 1).all()


class TestBezoldBrucke:
    def test_zero_amount_identity(self):
        from kajiya_tpu.renderers.post import bezold_brucke_shift

        rng = np.random.default_rng(1)
        rgb = jnp.asarray(rng.uniform(0, 2, (8, 8, 3)).astype(np.float32))
        out = np.asarray(bezold_brucke_shift(rgb, 0.0))
        np.testing.assert_allclose(out, np.asarray(rgb), atol=1e-4)

    def test_preserves_luminance_and_shifts_hue(self):
        """The shift rotates chromaticity around the white point: XYZ Y is
        exactly preserved; a saturated red drifts toward yellow (Pridmore:
        long wavelengths outside 605-620 shift positive at red's hue
        coordinate, i.e. toward shorter-wavelength orange/yellow appearance
        mapped as a rotation toward the yellow axis)."""
        from kajiya_tpu.renderers.post import (_RGB2XYZ, bezold_brucke_shift)
        from kajiya_tpu.ops.smallvec import matvec

        red = jnp.asarray([[[1.0, 0.05, 0.02]]])
        out = bezold_brucke_shift(red, 1.0)
        y_in = float(matvec(_RGB2XYZ, red)[0, 0, 1])
        y_out = float(matvec(_RGB2XYZ, out)[0, 0, 1])
        assert abs(y_in - y_out) < 1e-5
        o = np.asarray(out)[0, 0]
        r = np.asarray(red)[0, 0]
        # hue moved: green/red ratio changed measurably, not a no-op
        assert abs(o[1] / o[0] - r[1] / r[0]) > 5e-3
        assert np.isfinite(o).all() and (o >= 0).all()

    def test_achromatic_unchanged(self):
        from kajiya_tpu.renderers.post import bezold_brucke_shift

        grey = jnp.full((4, 4, 3), 0.5)
        out = np.asarray(bezold_brucke_shift(grey, 1.0))
        np.testing.assert_allclose(out, 0.5, atol=1e-3)
