"""Headline benchmark: full hybrid-GI frame time at 1920x1080 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference's 8.4 ms full-frame figure on an RX 6800 XT
(docs/gi-overview.md:7, BASELINE.md); vs_baseline = ours / theirs (lower is
better, 1.0 = parity).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MS = 8.4
WIDTH, HEIGHT = 1920, 1080
WARMUP, ITERS = 2, 8


def main():
    import jax

    from kajiya_tpu.core.camera import make_view_constants
    from kajiya_tpu.frame import RenderConfig, init_frame_state, render_frame
    from kajiya_tpu.scene.procedural import cornell_box
    from kajiya_tpu.scene.scene import build_gpu_scene
    from kajiya_tpu.world import build_trace_scene

    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_trace_steps=96)
    gpu = build_gpu_scene(cornell_box())
    ts, levels = build_trace_scene(gpu)
    view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                               fov_y_deg=55.0, width=WIDTH, height=HEIGHT)
    state = init_frame_state(cfg)

    step = jax.jit(lambda ts_, s, v: render_frame(ts_, s, v, cfg, levels=levels))

    for _ in range(WARMUP):
        state, out = step(ts, state, view)
    jax.block_until_ready(out["final"])

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        state, out = step(ts, state, view)
        jax.block_until_ready(out["final"])
        times.append((time.perf_counter() - t0) * 1e3)

    ms = float(np.median(times))
    print(json.dumps({
        "metric": "hybrid_gi_frame_ms_1080p",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(ms / BASELINE_MS, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
