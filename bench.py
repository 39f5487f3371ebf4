"""Headline benchmark: full hybrid-GI frame time at 1920x1080 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference's 8.4 ms full-frame figure on an RX 6800 XT
(docs/gi-overview.md:7, BASELINE.md); vs_baseline = ours / theirs (lower is
better, 1.0 = parity).

Timing: on this remote-TPU tunnel, `block_until_ready` returns before the
device finishes and the first device->host readback adds a large fixed cost
and flips the session into synchronous dispatch — naive wall-clock is wrong
in both directions (measured: a 380 ms frame reads as 0.8 ms async or
~900 ms post-readback). The primary method is therefore DEVICE-SIDE: run N
frames inside a jax.profiler trace and take the median on-device span of
the top-level jit executions. Wall-clock slope over a chained run is the
fallback when no trace is produced.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np

BASELINE_MS = 8.4
WIDTH, HEIGHT = 1920, 1080
N_TIMED = 4


def _device_ms_from_trace(trace_dir):
    """Median duration of the top-level jit device events, in ms."""
    paths = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return None
    with gzip.open(max(paths, key=os.path.getmtime)) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    durs = [e["dur"] / 1000.0 for e in ev
            if e.get("ph") == "X" and "dur" in e
            and "TPU" in pid_names.get(e.get("pid"), "")
            and e.get("name", "").startswith("jit_")]
    durs = [d for d in durs if d > 0.05]
    if not durs:
        return None
    return float(np.median(durs))


def _measure(step, state):
    import jax

    # warm up / compile both weak-type signatures without any readback
    state, out = step(state)
    state, out = step(state)
    jax.block_until_ready(out["final"])
    time.sleep(1.0)

    trace_dir = tempfile.mkdtemp(prefix="kajiya_bench_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(N_TIMED):
            state, out = step(state)
        jax.block_until_ready(out["final"])
        time.sleep(2.0)
    wall = (time.perf_counter() - t0) * 1e3

    ms = _device_ms_from_trace(trace_dir)
    if ms is not None:
        return ms, "device_trace"
    # fallback: readback-synced wall clock (includes tunnel overhead)
    t0 = time.perf_counter()
    for _ in range(N_TIMED):
        state, out = step(state)
    _ = float(np.asarray(out["exposure"]))
    return (time.perf_counter() - t0) * 1e3 / N_TIMED, "wall_sync"


def main():
    from kajiya_tpu.core import jitcache

    jitcache.enable()   # minutes-long frame compiles persist across runs
    from kajiya_tpu.core.camera import make_view_constants
    from kajiya_tpu.frame import RenderConfig, init_frame_state, render_frame
    from kajiya_tpu.ops.hoist import jit_hoisted
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
        ("hybrid_gi_frame_ms_1080p_core",
         dict(use_ircache=False, use_restir_gi=False, use_rtr=False,
              use_motion_blur=False)),
    ]
    result = None
    for metric, kw in attempts:
        cfg = RenderConfig(width=WIDTH, height=HEIGHT, **kw)
        state = init_frame_state(cfg)
        for attempt in range(2):
            step = jit_hoisted(
                lambda s, _cfg=cfg: render_frame(ts, s, view, _cfg,
                                                 levels=levels))
            try:
                ms, how = _measure(step, state)
                result = {"metric": metric, "value": round(ms, 3),
                          "unit": "ms",
                          "vs_baseline": round(ms / BASELINE_MS, 3),
                          "timing": how}
                break
            except Exception as e:
                print(f"# {metric} attempt {attempt} failed: "
                      f"{type(e).__name__}: {str(e)[:120]}", file=sys.stderr)
                time.sleep(15)
        if result is not None:
            break

    if result is None:
        result = {"metric": "bench_failed", "value": -1.0, "unit": "ms",
                  "vs_baseline": -1.0}

    # second datum: production-scene frame (76k-tri pica diorama, textures +
    # normal maps, full GI). Rides the same JSON line as "extra" so the
    # driver contract (one line) holds. Tries the Pallas streaming tracer
    # first; on a Mosaic-rejecting libtpu, retries via the XLA culled path
    # (KAJIYA_NO_PALLAS_TRACE honored by rt/trace.py).
    dio = _bench_diorama()
    if dio is not None:
        result["extra"] = dio
    print(json.dumps(result))


def _bench_diorama():
    import os

    from kajiya_tpu.core.camera import make_view_constants
    from kajiya_tpu.frame import RenderConfig, init_frame_state, render_frame
    from kajiya_tpu.ops.hoist import jit_hoisted
    from kajiya_tpu.scene.cache import load_mesh_cached
    from kajiya_tpu.scene.scene import Scene, build_gpu_scene
    from kajiya_tpu.world import build_trace_scene

    path = ("/root/reference/assets/meshes/pica_pica_-_mini_diorama_01/"
            "scene.gltf")
    if not os.path.exists(path):
        return None
    try:
        scene = Scene()
        scene.add_instance(scene.add_mesh(load_mesh_cached(path)),
                           scale=(0.05, 0.05, 0.05))
        gpu = build_gpu_scene(scene)
        ts, levels = build_trace_scene(gpu)
        view = make_view_constants((0.0, 0.6, 1.4), (0.0, -0.35, -1.0),
                                   fov_y_deg=55.0, width=WIDTH, height=HEIGHT)
    except Exception as e:
        print(f"# diorama scene build failed: {type(e).__name__}: "
              f"{str(e)[:120]}", file=sys.stderr)
        return None

    for pallas_off in (False, True):
        if pallas_off:
            os.environ["KAJIYA_NO_PALLAS_TRACE"] = "1"
        try:
            cfg = RenderConfig(width=WIDTH, height=HEIGHT)
            state = init_frame_state(cfg)
            step = jit_hoisted(
                lambda s: render_frame(ts, s, view, cfg, levels=levels))
            ms, how = _measure(step, state)
            return {"metric": "hybrid_gi_frame_ms_1080p_diorama",
                    "value": round(ms, 3), "unit": "ms",
                    "tris": int(gpu.num_triangles),
                    "vs_baseline": round(ms / BASELINE_MS, 3),
                    "timing": how,
                    "tracer": "xla_culled" if pallas_off else "pallas"}
        except Exception as e:
            print(f"# diorama bench ({'xla' if pallas_off else 'pallas'}) "
                  f"failed: {type(e).__name__}: {str(e)[:120]}",
                  file=sys.stderr)
    return None


if __name__ == "__main__":
    sys.exit(main())
