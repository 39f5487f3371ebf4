"""Cost-structure probe for the culled streaming kernel: time the 1080p
primary pass with the per-chunk visit count clamped to K (results are wrong
for small K — this measures the loop, not the image): separates fixed
per-chunk overhead from per-visit cost.

Run EXCLUSIVELY on the TPU: python tools/culled_cost_model.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _trace_ms(run):
    import glob
    import gzip
    import json
    import tempfile

    jax.block_until_ready(run())
    time.sleep(1)
    trace_dir = tempfile.mkdtemp(prefix="jaxtrace_cost_")
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
    from kajiya_tpu.ops.woop_pallas import (CULL_RAY_BLOCK, _active_blocks,
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
    ts, _levels = build_trace_scene(gpu)
    W, H = 1920, 1080
    view = make_view_constants((0.0, 0.6, 1.4), (0.0, -0.35, -1.0),
                               fov_y_deg=55.0, width=W, height=H)
    org, d = camera_rays(view, W, H)
    orgf = tile_order(org).reshape(-1, 3)
    df = tile_order(d).reshape(-1, 3)

    rb = CULL_RAY_BLOCK
    nrb = orgf.shape[0] // rb
    tmax = jnp.full((orgf.shape[0],), jnp.float32(1e30))
    blist, bdist, count = jax.jit(
        lambda o, dd, tm: _active_blocks(ts.woop, o, dd, tm, nrb, rb))(
            orgf, df, tmax)
    count_np = np.asarray(count)
    print(f"chunks {nrb}  visits mean {count_np.mean():.1f}", flush=True)

    for kcap in (0, 4, 16, 9999):
        cc = jnp.minimum(count, jnp.int32(kcap))
        run = jax.jit(lambda _cc=cc: intersect_culled_pallas(
            ts.woop, orgf, df, block_lists=(blist, bdist, _cc),
            early_stop=False))
        ms = _trace_ms(run)
        eff = np.minimum(count_np, kcap).mean()
        print(f"cap={kcap:>4}  visits/chunk={eff:6.1f}  {ms:7.1f} ms "
              f"({ms*1e3/nrb:.1f} us/chunk)", flush=True)


if __name__ == "__main__":
    main()
