"""On-chip validation of the culled streaming tracer: correctness vs the
XLA brute path (at HIGHEST matmul precision — the default bf16 MXU passes
make the *brute* path the imprecise one) on the 76k-tri diorama, then a
device-trace-timed 1080p primary-visibility pass with early-stop on/off
(the VERDICT 'scalable traversal' datum).

Run EXCLUSIVELY on the TPU: python tools/check_culled_onchip.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")


def _trace_ms(run):
    import glob
    import gzip
    import json
    import tempfile

    jax.block_until_ready(run())
    time.sleep(1)
    trace_dir = tempfile.mkdtemp(prefix="jaxtrace_culled_")
    with jax.profiler.trace(trace_dir):
        out = run()
        jax.block_until_ready(out)
        time.sleep(2)
    paths = glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz")
    with gzip.open(max(paths, key=os.path.getmtime)) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    durs = [e["dur"] / 1000.0 for e in ev
            if e.get("ph") == "X" and "dur" in e
            and "TPU" in pid_names.get(e.get("pid"), "")
            and e.get("name", "").startswith("jit_")]
    return max(durs) if durs else float("nan")


def main():
    from kajiya_tpu.core.camera import camera_rays, make_view_constants
    from kajiya_tpu.ops.tiling import tile_order
    from kajiya_tpu.ops.woop import intersect_brute
    from kajiya_tpu.ops.woop_pallas import (CULL_RAY_BLOCK,
                                            _active_blocks,
                                            intersect_culled_pallas)
    from kajiya_tpu.scene.cache import load_mesh_cached
    from kajiya_tpu.scene.scene import Scene, build_gpu_scene
    from kajiya_tpu.world import build_trace_scene

    path = ("/root/reference/assets/meshes/pica_pica_-_mini_diorama_01/"
            "scene.gltf")
    scene = Scene()
    scene.add_instance(scene.add_mesh(load_mesh_cached(path)),
                       scale=(0.05, 0.05, 0.05))
    gpu = build_gpu_scene(scene)
    print("tris:", gpu.num_triangles, flush=True)
    ts, _levels = build_trace_scene(gpu)
    W, H = 1920, 1080
    view = make_view_constants((0.0, 0.6, 1.4), (0.0, -0.35, -1.0),
                               fov_y_deg=55.0, width=W, height=H)
    org, d = camera_rays(view, W, H)
    orgf = tile_order(org).reshape(-1, 3)
    df = tile_order(d).reshape(-1, 3)

    # --- culling stats on camera rays: how many blocks does a chunk visit?
    rb = CULL_RAY_BLOCK
    nrb = orgf.shape[0] // rb
    tmax = jnp.full((orgf.shape[0],), jnp.float32(1e30))
    _bl, bd, cnt = jax.jit(
        lambda o, dd, tm: _active_blocks(ts.woop, o, dd, tm, nrb, rb))(
            orgf, df, tmax)
    cnt = np.asarray(cnt)
    print(f"chunks: {nrb}  active blocks/chunk: mean {cnt.mean():.1f} "
          f"p50 {np.percentile(cnt, 50):.0f} p99 {np.percentile(cnt, 99):.0f}"
          f" max {cnt.max()}", flush=True)

    # --- correctness on a 64Ki slice ---
    n = 1 << 16
    stride = orgf.shape[0] // n
    os_ = orgf[::stride][:n]
    ds_ = df[::stride][:n]
    t_b, tri_b, _u, _v = jax.jit(
        lambda o, dd: intersect_brute(ts.woop, o, dd, ray_block=8192))(
            os_, ds_)
    t_b, tri_b = np.asarray(t_b), np.asarray(tri_b)
    hit_b = tri_b >= 0
    for es in (False, True):
        t_c, tri_c, u_c, v_c = jax.jit(
            lambda o, dd, _es=es: intersect_culled_pallas(
                ts.woop, o, dd, early_stop=_es))(os_, ds_)
        t_c, tri_c = np.asarray(t_c), np.asarray(tri_c)
        hit_c = tri_c >= 0
        agree = (hit_c == hit_b)
        both = hit_c & hit_b
        dt = np.abs(t_c[both] - t_b[both])
        print(f"[early_stop={es}] hit agree: {agree.mean():.6f} "
              f"({(~agree).sum()}/{n})  max|dt|={dt.max():.2e} "
              f"n(|dt|>1e-3)={int((dt > 1e-3).sum())}", flush=True)

    # --- perf: full 1080p primary pass, early stop off/on ---
    for es in (False, True):
        run = jax.jit(lambda _es=es: intersect_culled_pallas(
            ts.woop, orgf, df, early_stop=_es))
        ms = _trace_ms(run)
        nray = orgf.shape[0]
        print(f"[early_stop={es}] 1080p primary: {ms:.1f} ms "
              f"({nray/(ms*1e-3)/1e6:.0f} Mray/s)", flush=True)


if __name__ == "__main__":
    main()
