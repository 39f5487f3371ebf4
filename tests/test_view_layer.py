"""View-app layer: sequencer, sun controller, camera rig, WRC, lighting, IBL."""
import numpy as np
import jax.numpy as jnp
import pytest

from kajiya_tpu.apps.camera_rig import CameraRig
from kajiya_tpu.apps.sequence import Sequence, SunController


class TestSequence:
    def test_interpolates_through_keys(self):
        s = (Sequence()
             .add(0.0, (0, 0, 0), (0, 0, -1))
             .add(1.0, (1, 0, 0), (0, 0, -1))
             .add(2.0, (1, 1, 0), (1, 0, 0)))
        k = s.sample(0.0)
        assert np.allclose(k.cam_pos, (0, 0, 0))
        k = s.sample(2.0)
        assert np.allclose(k.cam_pos, (1, 1, 0))
        mid = s.sample(0.5)
        assert 0.0 < mid.cam_pos[0] < 1.0
        assert abs(np.linalg.norm(mid.cam_dir) - 1.0) < 1e-5

    def test_roundtrip_dict(self):
        s = Sequence().add(0, (0, 0, 0), (0, 0, -1), (0, 1, 0)).add(
            1, (1, 0, 0), (0, 0, -1), (1, 1, 0))
        d = s.to_dict()
        s2 = Sequence.from_dict(d)
        assert np.allclose(s2.sample(0.7).cam_pos, s.sample(0.7).cam_pos)

    def test_sun_controller(self):
        c = SunController()
        d0 = c.direction.copy()
        d1 = c.rotate(0.3, 0.1)
        assert abs(np.linalg.norm(d1) - 1.0) < 1e-5
        assert not np.allclose(d0, d1)
        # elevation clamps below zenith
        for _ in range(100):
            c.rotate(0.0, 0.3)
        assert c.direction[1] < 1.0


class TestCameraRig:
    def test_smooth_approach(self):
        rig = CameraRig(position=(0, 0, 0))
        rig.translate(0, 0, -5.0)
        for _ in range(100):
            pos, fwd = rig.update(1 / 60)
        assert np.allclose(pos, rig.target_pos, atol=1e-2)
        assert abs(np.linalg.norm(fwd) - 1.0) < 1e-5

    def test_look_clamps_pitch(self):
        rig = CameraRig()
        rig.look(0.0, 10.0)
        assert rig.target_pitch < np.pi / 2


class TestWrc:
    def test_trace_and_lookup(self):
        from kajiya_tpu.renderers import wrc
        from kajiya_tpu.scene.procedural import cornell_box
        from kajiya_tpu.scene.scene import build_gpu_scene
        from kajiya_tpu.sky.env import build_sky_env, convolve_diffuse
        from kajiya_tpu.world import build_trace_scene

        cfg = wrc.WrcConfig(grid=(2, 2, 2), probe_res=8,
                            grid_spacing=1.0, grid_origin=(-0.5, -0.5, -0.5))
        gpu = build_gpu_scene(cornell_box())
        ts, _ = build_trace_scene(gpu)
        sky = build_sky_env(gpu.sun_direction, 32)
        dif = convolve_diffuse(sky, 8)
        st = wrc.init_state(cfg)
        st = wrc.trace_wrc(st, ts, sky, dif, 0, cfg, max_trace_steps=128,
                           hysteresis=0.0)
        atlas = np.asarray(st["wrc_atlas"])
        assert atlas.shape == (8, 8, 8, 3)
        assert np.isfinite(atlas).all()
        assert atlas.max() > 0.0       # the ceiling light is visible somewhere
        rad = wrc.lookup(st, cfg, jnp.zeros((4, 3)),
                         jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (4, 1)))
        assert rad.shape == (4, 3)

    def test_see_through_runs(self):
        from kajiya_tpu.renderers import wrc

        cfg = wrc.WrcConfig(grid=(2, 2, 2), probe_res=8)
        st = wrc.init_state(cfg)
        st = {"wrc_atlas": st["wrc_atlas"] + 0.5}
        out = wrc.see_through(st, cfg, jnp.zeros((4, 3)),
                              jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (4, 1)))
        assert out.shape == (4, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestMeshLightSpecular:
    def test_highlight_from_emissive(self):
        from kajiya_tpu.core.camera import make_view_constants
        from kajiya_tpu.renderers.gbuffer import raytrace_gbuffer
        from kajiya_tpu.renderers.lighting import sample_lights_specular
        from kajiya_tpu.scene.procedural import cornell_box
        from kajiya_tpu.scene.scene import build_gpu_scene
        from kajiya_tpu.world import build_trace_scene

        scene = cornell_box(box_metallic=0.9, box_roughness=0.2)
        gpu = build_gpu_scene(scene)
        ts, _ = build_trace_scene(gpu)
        view = make_view_constants((0, 0, 2.4), (0, 0, -1), width=64, height=48)
        gb = raytrace_gbuffer(ts, view, 64, 48, max_trace_steps=256)
        spec = np.asarray(sample_lights_specular(ts, gb, 0,
                                                 max_trace_steps=256))
        assert spec.shape == (24, 32, 3)
        assert np.isfinite(spec).all()
        assert spec.max() > 0.0


class TestRendererResilience:
    def test_draw_survives_frame_failure(self):
        """A jit/execute failure after the first good frame must not kill
        the loop: draw() returns the last good outputs and leaves the
        temporal state untouched (ref `kajiya-rg/src/renderer.rs:466-497`,
        stale-pipeline presentation)."""
        import jax
        from kajiya_tpu.frame import (RenderConfig, Renderer)
        from kajiya_tpu.scene.procedural import cornell_box

        cfg = RenderConfig(width=32, height=24, max_trace_steps=64,
                           use_taa=False, use_motion_blur=False,
                           use_ircache=False, use_rtr=False)
        r = Renderer(cornell_box(), cfg)
        from kajiya_tpu.core.camera import make_view_constants

        view = make_view_constants((0, 0, 2.4), (0, 0, -1), width=32,
                                   height=24)
        good = r.draw(view)
        state_after_good = r.state
        ok_fn = r._frame

        def broken(ts, state, view):
            raise RuntimeError("injected compile failure")

        r._frame = broken
        out = r.draw(view)       # must NOT raise
        assert out is good
        assert r.state is state_after_good
        # second failure with the same message: still survives (logged once)
        out2 = r.draw(view)
        assert out2 is good
        # recovery: put the real frame back, loop continues advancing
        r._frame = ok_fn
        out3 = r.draw(view)
        assert out3 is not good
        assert np.isfinite(np.asarray(out3["final"])).all()

    def test_first_frame_failure_propagates(self):
        from kajiya_tpu.frame import RenderConfig, Renderer
        from kajiya_tpu.scene.procedural import cornell_box

        cfg = RenderConfig(width=32, height=24, max_trace_steps=64,
                           use_taa=False, use_motion_blur=False,
                           use_ircache=False, use_rtr=False)
        r = Renderer(cornell_box(), cfg)

        def broken(ts, state, view):
            raise RuntimeError("boom")

        r._frame = broken
        from kajiya_tpu.core.camera import make_view_constants

        view = make_view_constants((0, 0, 2.4), (0, 0, -1), width=32,
                                   height=24)
        with pytest.raises(RuntimeError):
            r.draw(view)


class TestAnimatedDemo:
    def test_animated_sequence_renders(self, tmp_path):
        """The --animate path: orbit rig + moving sun + spinning instance
        through set_transforms, N frames, no exception, finite output."""
        from kajiya_tpu.apps import view as view_app

        out = tmp_path / "anim.png"
        view_app.main(["--scene", "cornell_box", "--width", "64",
                       "--height", "48", "--animate", "4",
                       "-o", str(out)])
        assert out.exists()
        from PIL import Image

        img = np.asarray(Image.open(out))
        assert img.shape[:2] == (48, 64)
        assert img.max() > 8          # not a black frame


class TestIblHdr:
    def test_hdr_roundtrip(self, tmp_path):
        """Write a tiny flat-format .hdr and decode it."""
        from kajiya_tpu.sky.ibl import load_hdr, panorama_to_env

        h, w = 4, 4
        rgbe = np.zeros((h, w, 4), np.uint8)
        # value 1.0 -> mantissa 128, exponent 129 (0.5*2^(129-128)=1.0)
        rgbe[..., :3] = 128
        rgbe[..., 3] = 129
        header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + \
            f"-Y {h} +X {w}\n".encode()
        p = tmp_path / "t.hdr"
        p.write_bytes(header + rgbe.tobytes())
        img = load_hdr(str(p))
        assert img.shape == (4, 4, 3)
        np.testing.assert_allclose(img, 1.0, rtol=1e-6)
        env = panorama_to_env(img, res=16)
        assert env.shape == (16, 16, 3)
        np.testing.assert_allclose(np.asarray(env), 1.0, rtol=1e-6)


class TestStreamViewer:
    """Presentation layer (apps/stream.py): mailbox semantics + HTTP
    endpoints against a stub renderer (no jit compile in this test)."""

    def test_mailbox_latest_wins(self):
        from kajiya_tpu.apps.stream import FrameMailbox

        mb = FrameMailbox()
        mb.put(np.zeros((2, 2, 3), np.uint8))
        mb.put(np.ones((2, 2, 3), np.uint8))
        frame, seq = mb.get(0, timeout=0.1)
        assert frame is not None and frame.max() == 1 and seq == 2

    def test_http_endpoints(self):
        import json
        import threading
        import urllib.request

        from kajiya_tpu.apps.stream import serve

        from types import SimpleNamespace

        from kajiya_tpu.frame import RenderConfig

        class StubRenderer:
            cfg = RenderConfig(width=8, height=6)
            ts = SimpleNamespace(gpu=SimpleNamespace(
                mat_emissive=np.zeros((1, 3), np.float32),
                sun_direction=np.array([0.0, 1.0, 0.0], np.float32)))
            _last_error = None

            def draw(self, view):
                return {"final": np.full((6, 8, 3), 0.5, np.float32)}

            def rebuild(self):
                pass

        class StubView:
            pass

        # avoid make_view_constants (jax) in the loop: monkeypatch via module
        import kajiya_tpu.apps.stream as sm

        orig = sm.render_loop

        def loop(vs, mailbox, *a):
            stop = a[-1]
            while not stop.is_set():
                out = vs.renderer.draw(None)
                img = np.asarray(out["final"])
                mailbox.put((img * 255).astype(np.uint8))
                stop.wait(0.01)

        sm.render_loop = loop
        try:
            srv, stopev = serve(StubRenderer(), (0, 0, 2), (0, 0, -1),
                                port=0, block=False)
            port = srv.server_address[1]
            snap = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/snap", timeout=10).read()
            assert snap[:4] == b"\x89PNG"
            st = json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{port}/status", timeout=5).read())
            assert st["config"]["debug_mode"] == "none"
            assert st["show"] == "final"
            r = json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{port}/set?ev=1.5&orbit=0.2",
                timeout=5).read())
            assert r["ev"] == 1.5 and r["orbit"] == 0.2
            # pass-output picker (GraphDebugHook analog) + generic config set
            r = json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{port}/set?show=ssao&use_rtr=false"
                "&roughness_scale=0.5", timeout=5).read())
            assert (r["show"], r["use_rtr"], r["roughness_scale"]) == \
                ("ssao", False, 0.5)
            # unknown output advertises the menu (the /ui page builds on it)
            r = json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{port}/set?show=zzz", timeout=5).read())
            assert "gbuffer.albedo" in r["known_outputs"]
            # sun controller mutates the traced array, no rebuild needed
            r = json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{port}/set?sun=0,90", timeout=5).read())
            assert abs(r["sun"][1] - 1.0) < 1e-6
            # the imgui-analog panel serves
            html = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/ui", timeout=5).read()
            assert b"Debug mode" in html
            stopev.set()
            srv.shutdown()
        finally:
            sm.render_loop = orig
