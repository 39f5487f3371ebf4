"""RTDGI path validation (diffuse_validate.rgen.hlsl analog).

VERDICT r2 item 3: a light toggle must invalidate diffuse history within
one validation period (3 frames) instead of ghosting through the 24-frame
temporal filter."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.frame import RenderConfig, init_frame_state, render_frame
from kajiya_tpu.renderers import restir_gi
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene

W, H = 64, 48


class TestValidateReservoirs:
    def _mk(self):
        hh, hw = 24, 32
        state = restir_gi.init_state(2 * hh, 2 * hw)
        # stored reservoirs: hit point straight up at distance 2 from the
        # surface (origin), radiance 1
        state["gi_res_payload_hit"] = jnp.tile(
            jnp.asarray([0.0, 2.0, 0.0]), (hh, hw, 1))
        state["gi_res_payload_hitn"] = jnp.tile(
            jnp.asarray([0.0, -1.0, 0.0]), (hh, hw, 1))
        state["gi_res_payload_radiance"] = jnp.ones((hh, hw, 3))
        state["gi_res_M"] = jnp.full((hh, hw), 8.0)
        state["gi_res_W"] = jnp.ones((hh, hw))
        state["gi_res_p_hat"] = jnp.ones((hh, hw))
        state["gi_res_w_sum"] = jnp.full((hh, hw), 8.0)
        return state, hh, hw

    def test_light_change_replaces_and_cuts(self, monkeypatch):
        """Fresh trace returns dimmer radiance at the same hit distance ->
        traced lanes replaced (with firefly clamps), neighbors M-cut."""
        state, hh, hw = self._mk()

        fresh_val = 0.1

        def fake_trace(ts, org, d, t_min=0.0, max_steps=None):
            class Hit:
                t = jnp.full(org.shape[0], 2.0)      # same hit distance
                tri = jnp.zeros(org.shape[0], jnp.int32)
                u = jnp.zeros(org.shape[0])
                v = jnp.zeros(org.shape[0])
                hit_mask = jnp.ones(org.shape[0], bool)
            return Hit()

        def fake_radiance(ts, hit, d, *a, **k):
            rad = jnp.full((d.shape[0], 3), fresh_val)
            aux = {"hit_pos": d * 2.0, "hit_geo_normal": -d}
            return (rad, aux) if k.get("return_aux") else rad

        monkeypatch.setattr("kajiya_tpu.rt.trace.scene_trace_closest",
                            fake_trace)
        monkeypatch.setattr(
            "kajiya_tpu.renderers.hit_lighting.hit_radiance", fake_radiance)

        gb_h = {"pos": jnp.zeros((hh, hw, 3)),
                "geo_normal": jnp.tile(jnp.asarray([0.0, 1.0, 0.0]),
                                       (hh, hw, 1))}
        new, inv = restir_gi.validate_reservoirs(
            None, state, gb_h, None, None, 0)
        new = {k: np.asarray(v) for k, v in new.items()}
        inv = np.asarray(inv)
        # radiance mismatch is large -> invalidity ~1 everywhere
        assert inv.mean() > 0.9
        # traced lanes (even, even) replaced with the fresh radiance
        assert np.allclose(new["gi_res_payload_radiance"][0::2, 0::2],
                           fresh_val, atol=1e-5)
        # neighbors keep their stale radiance but lose history
        assert np.allclose(new["gi_res_payload_radiance"][1::2, 1::2], 1.0)
        assert (new["gi_res_M"][1::2, 1::2] <= 1.0 + 1e-5).all()

    def test_occlusion_change_cuts_without_replace(self, monkeypatch):
        """Hit distance moved -> no payload replacement, history cut only."""
        state, hh, hw = self._mk()

        def fake_trace(ts, org, d, t_min=0.0, max_steps=None):
            class Hit:
                t = jnp.full(org.shape[0], 0.3)      # occluder appeared
                tri = jnp.zeros(org.shape[0], jnp.int32)
                u = jnp.zeros(org.shape[0])
                v = jnp.zeros(org.shape[0])
                hit_mask = jnp.ones(org.shape[0], bool)
            return Hit()

        def fake_radiance(ts, hit, d, *a, **k):
            rad = jnp.zeros((d.shape[0], 3))
            aux = {"hit_pos": d * 0.3, "hit_geo_normal": -d}
            return (rad, aux) if k.get("return_aux") else rad

        monkeypatch.setattr("kajiya_tpu.rt.trace.scene_trace_closest",
                            fake_trace)
        monkeypatch.setattr(
            "kajiya_tpu.renderers.hit_lighting.hit_radiance", fake_radiance)

        gb_h = {"pos": jnp.zeros((hh, hw, 3)),
                "geo_normal": jnp.tile(jnp.asarray([0.0, 1.0, 0.0]),
                                       (hh, hw, 1))}
        new, inv = restir_gi.validate_reservoirs(
            None, state, gb_h, None, None, 0)
        new = {k: np.asarray(v) for k, v in new.items()}
        assert np.allclose(new["gi_res_payload_radiance"], 1.0)
        assert (new["gi_res_M"] <= 1.0 + 1e-5).all()


class TestLightToggleFrame:
    def test_history_invalidated_within_period(self):
        """Render with a bright emitter, dim it 5x, and check the diffuse
        history drops most of the way to the new level within one
        validation period (3 frames)."""
        bright = cornell_box()
        gpu_a = build_gpu_scene(bright)
        ts_a, levels_a = build_trace_scene(gpu_a)
        # dim: scale the emissive material channel
        gpu_b = dataclasses.replace(gpu_a, mat_emissive=gpu_a.mat_emissive * 0.2)
        ts_b, levels_b = build_trace_scene(gpu_b)

        view = make_view_constants((0, 0, 2.4), (0, 0, -1), fov_y_deg=55.0,
                                   width=W, height=H)
        cfg = RenderConfig(width=W, height=H, max_trace_steps=256,
                           use_taa=False, use_motion_blur=False)
        state = init_frame_state(cfg)
        step_a = jax.jit(lambda s: render_frame(ts_a, s, view, cfg,
                                                levels=levels_a))
        step_b = jax.jit(lambda s: render_frame(ts_b, s, view, cfg,
                                                levels=levels_b))
        for _ in range(9):
            state, out = step_a(state)
        lit_a = float(np.asarray(out["lit"]).mean())
        for _ in range(4):          # >= one validation period
            state, out = step_b(state)
        lit_after = float(np.asarray(out["lit"]).mean())
        # converge scene B from scratch for the target level
        state_b = init_frame_state(cfg)
        for _ in range(9):
            state_b, out_b = step_b(state_b)
        lit_b = float(np.asarray(out_b["lit"]).mean())

        # after 4 frames the image must have covered most of the gap; the
        # 24-frame EMA alone would cover ~15%
        covered = (lit_a - lit_after) / max(lit_a - lit_b, 1e-6)
        assert covered > 0.55, (lit_a, lit_after, lit_b, covered)


class TestMovingLight:
    def test_moving_emitter_no_ghost(self):
        """Move the whole box (and its emitter) sideways with NO motion
        vectors (worst case for reprojection): within 4 frames — one
        validation period + temporal catch-up — the image must cover most
        of the gap to a fresh render of the moved scene, i.e. the old
        emitter position must not ghost for the full 24-frame EMA window."""
        import dataclasses

        import jax.numpy as jnp

        gpu_a = build_gpu_scene(cornell_box())
        ts_a, levels_a = build_trace_scene(gpu_a)
        xf = np.asarray(gpu_a.xforms).copy()
        xf[0, :, 3] += np.array([0.5, 0.0, 0.0], np.float32)
        gpu_b = dataclasses.replace(gpu_a, xforms=jnp.asarray(xf),
                                    xforms_prev=jnp.asarray(xf))
        ts_b, levels_b = build_trace_scene(gpu_b)

        view = make_view_constants((0, 0, 2.4), (0, 0, -1), fov_y_deg=55.0,
                                   width=W, height=H)
        cfg = RenderConfig(width=W, height=H, max_trace_steps=256,
                           use_taa=False, use_motion_blur=False)
        state = init_frame_state(cfg)
        step_a = jax.jit(lambda s: render_frame(ts_a, s, view, cfg,
                                                levels=levels_a))
        step_b = jax.jit(lambda s: render_frame(ts_b, s, view, cfg,
                                                levels=levels_b))
        for _ in range(9):
            state, out = step_a(state)
        lit_a = np.asarray(out["lit"])
        for _ in range(4):
            state, out = step_b(state)
        lit_after = np.asarray(out["lit"])

        state_b = init_frame_state(cfg)
        for _ in range(9):
            state_b, out_b = step_b(state_b)
        lit_b = np.asarray(out_b["lit"])

        gap = np.abs(lit_a - lit_b).mean()
        residual = np.abs(lit_after - lit_b).mean()
        assert residual < 0.5 * gap, (residual, gap)
        # the OLD emitter band specifically must have dimmed: find the
        # brightest pixels of A that are dim in B and check they dropped
        old_hot = (lit_a.mean(-1) > 3.0) & (lit_b.mean(-1) < 1.0)
        if old_hot.sum() > 0:
            assert lit_after.mean(-1)[old_hot].mean() < 2.0
