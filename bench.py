"""Headline benchmark: full hybrid-GI frame time at 1920x1080 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference's 8.4 ms full-frame figure on an RX 6800 XT
(docs/gi-overview.md:7, BASELINE.md); vs_baseline = ours / theirs (lower is
better, 1.0 = parity).

Robustness: the remote TPU compiler has been observed to SIGILL on very
large fused graphs (XLA TpuPriorityFusionQueue bug). The benchmark tries the
full pipeline first and degrades to reduced configurations so a number is
always recorded; the metric name states what actually ran.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MS = 8.4
WIDTH, HEIGHT = 1920, 1080
WARMUP, ITERS = 2, 8


def _time_step(step, state):
    import jax

    for _ in range(WARMUP):
        state, out = step(state)
    jax.block_until_ready(out["final"] if isinstance(out, dict) else out)
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        state, out = step(state)
        jax.block_until_ready(out["final"] if isinstance(out, dict) else out)
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def main():
    import jax

    from kajiya_tpu.core.camera import make_view_constants
    from kajiya_tpu.frame import RenderConfig, init_frame_state, render_frame
    from kajiya_tpu.scene.procedural import cornell_box
    from kajiya_tpu.scene.scene import build_gpu_scene
    from kajiya_tpu.world import build_trace_scene

    gpu = build_gpu_scene(cornell_box())
    ts, levels = build_trace_scene(gpu)
    view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                               fov_y_deg=55.0, width=WIDTH, height=HEIGHT)

    attempts = [
        ("hybrid_gi_frame_ms_1080p", {}),
        ("hybrid_gi_frame_ms_1080p_no_ircache", dict(use_ircache=False)),
        ("hybrid_gi_frame_ms_1080p_no_ircache_restir",
         dict(use_ircache=False, use_restir_gi=False)),
        ("hybrid_gi_frame_ms_1080p_core",
         dict(use_ircache=False, use_restir_gi=False, use_rtr=False,
              use_motion_blur=False)),
    ]
    result = None
    for metric, kw in attempts:
        cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_trace_steps=96, **kw)
        state = init_frame_state(cfg)
        # the remote compiler's SIGILL is flaky (graph-hash sensitive):
        # retry the same config before degrading
        for attempt in range(2):
            from kajiya_tpu.ops.hoist import jit_hoisted

            step = jit_hoisted(
                lambda s, _cfg=cfg: render_frame(ts, s, view, _cfg,
                                                 levels=levels))
            try:
                ms = _time_step(step, state)
                result = {"metric": metric, "value": round(ms, 3),
                          "unit": "ms",
                          "vs_baseline": round(ms / BASELINE_MS, 3)}
                break
            except Exception as e:
                print(f"# {metric} attempt {attempt} failed: "
                      f"{type(e).__name__}: {str(e)[:120]}", file=sys.stderr)
                time.sleep(15)
        if result is not None:
            break

    if result is None:
        # last resort: primary-visibility gbuffer only
        from kajiya_tpu.renderers.gbuffer import raytrace_gbuffer

        f = jax.jit(lambda: raytrace_gbuffer(ts, view, WIDTH, HEIGHT))
        for _ in range(WARMUP):
            out = f()
        jax.block_until_ready(out["depth"])
        times = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            out = f()
            jax.block_until_ready(out["depth"])
            times.append((time.perf_counter() - t0) * 1e3)
        ms = float(np.median(times))
        result = {"metric": "gbuffer_trace_ms_1080p", "value": round(ms, 3),
                  "unit": "ms", "vs_baseline": round(ms / 1.15, 3)}

    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
