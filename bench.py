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

# Wall-clock guard: optional sections (diorama, RMSE) are skipped when the
# run is close to the driver's timeout, so the headline datum always lands.
# The guards gate section STARTS; a section that overruns anyway (an XLA
# compile cannot be preempted) is covered by the signal handler below: the
# headline JSON is printed the moment the driver's timeout signal arrives,
# so the datum is never lost to an optional extra (the round-3 failure).
_T_START = time.time()
_DEADLINE_S = float(os.environ.get("KAJIYA_BENCH_DEADLINE", 1200))
_RESULT = {}          # mutated in place as sections land


def _time_left():
    return _DEADLINE_S - (time.time() - _T_START)


def _finalized(res):
    """Collapse the extra list exactly the same way on every emit path:
    absent when empty, a bare dict when single-entry."""
    out = dict(res)
    extra = out.get("extra")
    if not extra:
        out.pop("extra", None)
    elif isinstance(extra, list) and len(extra) == 1:
        out["extra"] = extra[0]
    return out


def _mark(section):
    print(f"# [t={time.time() - _T_START:.0f}s] {section}", file=sys.stderr,
          flush=True)


def _emit_and_exit(signum, _frame):
    if _RESULT.get("metric"):
        print(json.dumps(_finalized(_RESULT)), flush=True)
        os._exit(0)
    print(json.dumps({"metric": "bench_failed", "value": -1.0, "unit": "ms",
                      "vs_baseline": -1.0,
                      "note": f"signal {signum} before headline"}),
          flush=True)
    os._exit(1)


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
    _mark("measure: compiling/warmup")
    state, out = step(state)
    state, out = step(state)
    jax.block_until_ready(out["final"])
    time.sleep(1.0)
    _mark("measure: tracing")

    trace_dir = tempfile.mkdtemp(prefix="kajiya_bench_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(N_TIMED):
            state, out = step(state)
        jax.block_until_ready(out["final"])
        time.sleep(2.0)
    wall = (time.perf_counter() - t0) * 1e3
    _mark(f"measure: trace done (wall {wall:.0f} ms), parsing")

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
    import signal
    import threading

    signal.signal(signal.SIGTERM, _emit_and_exit)   # `timeout` default sig
    # Python defers signal handlers while the main thread sits inside a C
    # call (an XLA compile) — exactly when an overrun happens. A daemon
    # watchdog thread prints+exits regardless of what the main thread is
    # stuck in, so the headline datum always reaches the driver.
    def _watchdog():
        time.sleep(max(_DEADLINE_S - (time.time() - _T_START), 1.0))
        _emit_and_exit("watchdog", None)

    threading.Thread(target=_watchdog, daemon=True).start()

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
        _mark(f"headline section: {metric}")
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
                          # a reduced fallback config is NOT comparable to
                          # the reference's full-GI 8.4 ms; only the full
                          # config gets a vs_baseline ratio
                          "vs_baseline": (round(ms / BASELINE_MS, 3)
                                          if not kw else -1.0),
                          "timing": how}
                if kw:
                    result["degraded"] = sorted(kw)
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
    _RESULT.update(result)

    # second datum: production-scene frame (76k-tri pica diorama, textures +
    # normal maps, full GI). Rides the same JSON line as "extra" so the
    # driver contract (one line) holds. Tries the Pallas streaming tracer
    # first; on a Mosaic-rejecting libtpu, retries via the XLA culled path
    # (KAJIYA_NO_PALLAS_TRACE honored by rt/trace.py).
    # THE PRODUCTION-SCENE DATUM RUNS FIRST AND NEARLY UNCONDITIONALLY
    # (VERDICT r4 #1: two rounds of start-guards starved it; the 36-tri
    # cornell headline does not measure the tracer at all). The watchdog
    # flushes whatever already landed if it overruns anyway.
    extra = []
    _RESULT["extra"] = extra
    if _time_left() > 120:
        _mark("diorama section")
        dio = _bench_diorama()
        if dio is not None:
            extra.append(dio)
    else:
        print("# skipping diorama bench (deadline)", file=sys.stderr)
    # RTX-off raster mode at 720p (BASELINE config 1: "raster mode, 720p").
    # The bundled 336_lrm scene is missing its .bin in this mount; the
    # cornell stands in. Raster primary + dummy shadow/GI, like the
    # reference's ray_tracing_enabled()=false path.
    if _time_left() > 240:
        _mark("raster 720p section")
        try:
            cfg = RenderConfig(width=1280, height=720, primary="raster",
                               sun_soft_shadows=False, use_rtdgi=False,
                               use_rtr=False, use_ircache=False,
                               use_restir_gi=False)
            view720 = make_view_constants(
                (0.0, 0.0, 2.4), (0.0, 0.0, -1.0), fov_y_deg=55.0,
                width=1280, height=720)
            state = init_frame_state(cfg)
            step = jit_hoisted(
                lambda s, _c=cfg: render_frame(ts, s, view720, _c,
                                               levels=levels))
            ms, how = _measure(step, state)
            extra.append({"metric": "raster_mode_frame_ms_720p",
                          "value": round(ms, 3), "unit": "ms",
                          "vs_baseline": round(ms / 1.15, 3),  # raster pass
                          "timing": how})
        except Exception as e:
            print(f"# raster bench failed: {type(e).__name__}: "
                  f"{str(e)[:120]}", file=sys.stderr)
    else:
        print("# skipping raster bench (deadline)", file=sys.stderr)
    # third datum: RMSE of the converged hybrid vs the PT oracle (the
    # BASELINE.json metric is the triplet ms / Mrays/s / RMSE; the oracle
    # comparison mirrors tests/test_oracle.py at a fixed tiny config)
    if _time_left() > 240:
        _mark("rmse section")
        rmse = _bench_rmse()
        if rmse is not None:
            extra.append(rmse)
    else:
        print("# skipping rmse bench (deadline)", file=sys.stderr)
    _mark("emitting")
    print(json.dumps(_finalized(_RESULT)))


def _bench_mrays(ts, view):
    """Primary-visibility trace rate on the current scene (the BASELINE
    'Mrays/s' metric): 1080p coherent camera rays through the production
    tracer, device-trace timed."""
    import jax

    from kajiya_tpu.core.camera import camera_rays
    from kajiya_tpu.ops.tiling import tile_order
    from kajiya_tpu.rt.trace import scene_trace_closest

    try:
        org, d = camera_rays(view, WIDTH, HEIGHT)
        orgf = tile_order(org).reshape(-1, 3)
        df = tile_order(d).reshape(-1, 3)
        run = jax.jit(lambda: scene_trace_closest(ts, orgf, df))
        jax.block_until_ready(run())
        trace_dir = tempfile.mkdtemp(prefix="kajiya_mrays_trace_")
        with jax.profiler.trace(trace_dir):
            for _ in range(4):
                out = run()
            jax.block_until_ready(out)
            time.sleep(2.0)
        ms = _device_ms_from_trace(trace_dir)
        if ms is None:
            return None
        return round(orgf.shape[0] / (ms * 1e-3) / 1e6, 1)
    except Exception as e:
        print(f"# mrays bench failed: {type(e).__name__}: {str(e)[:120]}",
              file=sys.stderr)
        return None


def _bench_rmse():
    """RMSE of the 16-frame hybrid vs a 256-spp PT oracle on the TEXTURED
    cornell at 256x192 (VERDICT r4 #4: the old 64x48/48-spp datum was a
    regression tripwire, not a quality claim). pixel_filter off for
    point-sample parity; matches tests/test_oracle.py::TestTexturedOracle
    at 4x the area and 5x the oracle spp."""
    from kajiya_tpu.core.camera import make_view_constants
    from kajiya_tpu.frame import (RenderConfig, init_frame_state,
                                  init_reference_state, render_frame,
                                  render_frame_reference)
    from kajiya_tpu.ops.hoist import jit_hoisted
    from kajiya_tpu.scene.procedural import textured_cornell_box
    from kajiya_tpu.scene.scene import build_gpu_scene
    from kajiya_tpu.world import build_trace_scene

    w, h = 256, 192
    try:
        gpu = build_gpu_scene(textured_cornell_box())
        ts, levels = build_trace_scene(gpu)
        view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                                   fov_y_deg=55.0, width=w, height=h)
        cfg = RenderConfig(width=w, height=h, max_trace_steps=256,
                           use_taa=False, use_motion_blur=False)
        rstate = init_reference_state(cfg)
        rstep = jit_hoisted(lambda s: render_frame_reference(
            ts, s, view, cfg, levels=levels, num_bounces=5,
            pixel_filter=False))
        for _ in range(256):
            rstate, rout = rstep(rstate)
        pt = np.asarray(rout["lit"])
        state = init_frame_state(cfg)
        step = jit_hoisted(
            lambda s: render_frame(ts, s, view, cfg, levels=levels))
        for _ in range(16):
            state, out = step(state)
        hy = np.asarray(out["lit"])
        rmse = float(np.sqrt(np.mean((hy - pt) ** 2)))
        return {"metric": "rmse_vs_oracle_textured_256x192_16f",
                "value": round(rmse, 4), "unit": "rmse",
                "vs_baseline": round(rmse / 0.21, 3),   # test-suite bound
                "frames": 16, "oracle_spp": 256}
    except Exception as e:
        print(f"# rmse bench failed: {type(e).__name__}: {str(e)[:120]}",
              file=sys.stderr)
        return None


def _bench_diorama():
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
    _mark("diorama scene built")

    for pallas_off in (False, True):
        if pallas_off:
            if _time_left() < 300:
                break       # no budget for a second cold compile
            os.environ["KAJIYA_NO_PALLAS_TRACE"] = "1"
        try:
            cfg = RenderConfig(width=WIDTH, height=HEIGHT)
            state = init_frame_state(cfg)
            step = jit_hoisted(
                lambda s: render_frame(ts, s, view, cfg, levels=levels))
            ms, how = _measure(step, state)
            _mark(f"diorama measured: {ms:.1f} ms")
            rec = {"metric": "hybrid_gi_frame_ms_1080p_diorama",
                   "value": round(ms, 3), "unit": "ms",
                   "tris": int(gpu.num_triangles),
                   "vs_baseline": round(ms / BASELINE_MS, 3),
                   "timing": how,
                   "tracer": "xla_culled" if pallas_off else "pallas"}
            # record the datum the moment it exists; Mrays/s enriches it
            # afterwards so a wedge there cannot lose the frame number
            _RESULT["extra"].append(rec)
            if _time_left() > 180:
                _mark("diorama mrays")
                mrays = _bench_mrays(ts, view)
                if mrays is not None:
                    rec["primary_mrays_per_s"] = mrays
            return None     # already appended
        except Exception as e:
            print(f"# diorama bench ({'xla' if pallas_off else 'pallas'}) "
                  f"failed: {type(e).__name__}: {str(e)[:120]}",
                  file=sys.stderr)
    return None


if __name__ == "__main__":
    sys.exit(main())
