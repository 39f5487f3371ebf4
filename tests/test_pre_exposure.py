"""Pre-exposure split (world_renderer.rs:217-286 parity).

The invariant that makes the split correct: the temporal stack runs on
PRE-EXPOSED radiance with history rescaled by each frame's pre-mult delta,
so the pre-exposure must cancel exactly — `taa_output / pre_mult` is
invariant under any exposure trajectory. A sudden EV step (sun occlusion,
user ev_shift) must therefore cause NO transient in the unexposed
accumulation: history fighting the neighborhood clamp (the failure the
reference's `pre_exposure_delta` rescale prevents) would show up as a
deviation on the very first frames after the step.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.frame import RenderConfig, init_frame_state, render_frame
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene

pytestmark = pytest.mark.slow

W, H = 128, 96


def test_ev_step_is_ghost_free():
    import jax

    gpu = build_gpu_scene(cornell_box())
    ts, levels = build_trace_scene(gpu)
    view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                               fov_y_deg=55.0, width=W, height=H)
    cfg = RenderConfig(width=W, height=H, max_trace_steps=256,
                       use_motion_blur=False)
    step = jax.jit(lambda s: render_frame(ts, s, view, cfg, levels=levels))

    state = init_frame_state(cfg)
    for _ in range(8):
        state, _ = step(state)

    # branch: same state, but variant B's metering jumps +4 EV abruptly
    state_a = dict(state)
    state_b = dict(state)
    state_b["smoothed_ev"] = state["smoothed_ev"] + 4.0

    for i in range(6):
        state_a, out_a = step(state_a)
        state_b, out_b = step(state_b)
        pre_a = float(state_a["pre_mult"])
        pre_b = float(state_b["pre_mult"])
        un_a = np.asarray(out_a["taa"]) / pre_a
        un_b = np.asarray(out_b["taa"]) / pre_b
        # pre_mult genuinely moved (the split is active, not a no-op) ...
        if i == 0:
            assert pre_b / pre_a > 1.5, (pre_a, pre_b)
        # ... yet the unexposed accumulation is identical: no clamp
        # ghosting, no energy error, from the very first post-step frame.
        # (max is not asserted: a handful of emitter-edge pixels sit on
        # bistable clamp decisions — the TAA constants are absolute in
        # pre-exposed space by design. Measured: relmean 1e-4..4e-4,
        # p99 ~5e-3; without the delta rescale relmean is ~0.4.)
        denom = max(un_a.mean(), 1e-6)
        d = np.abs(un_a - un_b)
        assert d.mean() / denom < 5e-3, (i, d.mean() / denom)
        assert np.percentile(d, 99) / denom < 2e-2, (
            i, np.percentile(d, 99) / denom)

    # pre_mult chases the stepped exposure with the reference's 0.9/0.1 EMA
    target = float(jnp.exp2(state_b["smoothed_ev"]))
    assert abs(float(state_b["pre_mult"]) / target - 1.0) < 0.7


def test_pre_mult_in_state_and_post_remainder():
    """post_combine sees exposure/pre_mult; with a converged pre_mult the
    final image must match a run whose pre-exposure is forced to identity
    (the split redistributes, never changes, the displayed exposure)."""
    import jax

    gpu = build_gpu_scene(cornell_box())
    ts, levels = build_trace_scene(gpu)
    view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                               fov_y_deg=55.0, width=W, height=H)
    cfg = RenderConfig(width=W, height=H, max_trace_steps=256,
                       use_motion_blur=False)
    step = jax.jit(lambda s: render_frame(ts, s, view, cfg, levels=levels))
    state = init_frame_state(cfg)
    for _ in range(4):
        state, out = step(state)

    forced = dict(state)
    forced["pre_mult"] = jnp.asarray(1.0, jnp.float32)
    # one frame is not enough for histories to re-converge, so compare a
    # freshly-warmed pair instead: run both to frame 8 and require the
    # final (displayed) images to agree closely.
    s_a, s_b = dict(state), forced
    for _ in range(8):
        s_a, out_a = step(s_a)
        s_b, out_b = step(s_b)
    fa, fb = np.asarray(out_a["final"]), np.asarray(out_b["final"])
    assert np.abs(fa - fb).mean() < 0.015, np.abs(fa - fb).mean()
