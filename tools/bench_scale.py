"""Reference-scale traversal probe: the procedural `city` at ~1.2M tris.

Measures, device-trace timed (tools/devtime.py method):
  1. primary visibility 1080p through the raster screen-rect path
  2. a divergent hemisphere wavefront (GI stand-in), sorted vs unsorted
Prints ms + Mrays/s for each. Run ALONE on the TPU box.

Usage: python tools/bench_scale.py [n_grid] [subdiv]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    sub = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from kajiya_tpu.core.camera import camera_rays, make_view_constants
    from kajiya_tpu.scene.procedural import city
    from kajiya_tpu.scene.scene import build_gpu_scene
    from kajiya_tpu.world import build_trace_scene
    from kajiya_tpu.rt.trace import scene_trace_closest
    from tools.devtime import device_ms

    t0 = time.time()
    scene = city(n=n, subdiv=sub)
    gpu = build_gpu_scene(scene, with_textures=False)
    ts, levels = build_trace_scene(gpu, brute_max_tris=4_000_000)
    ntri = int(gpu.num_triangles)
    print(f"scene: {ntri} tris, build {time.time()-t0:.1f}s; "
          f"woop={'culled' if (isinstance(ts.woop, dict) and ts.woop.get('cmin') is not None) else type(ts.woop).__name__}")

    w, h = 1920, 1080
    ext = n * 3.0 * 0.5
    view = make_view_constants((0.0, ext * 0.6, ext * 1.15),
                               (0.0, -0.45, -1.0), fov_y_deg=55.0,
                               width=w, height=h)

    # 1) primary rays through the raster screen-rect path
    from kajiya_tpu.renderers.raster import raster_hit

    def prim():
        return raster_hit(ts, view, w, h)

    hit = jax.jit(prim)()
    jax.block_until_ready(hit.t)
    hm = float(np.asarray(hit.hit_mask.mean()))
    ms = device_ms(prim, iters=3)
    print(f"primary raster 1080p: {ms:.2f} ms, "
          f"{w*h/(ms*1e-3)/1e6:.0f} Mray/s, hit-rate {hm:.2f}")

    # 2) divergent wavefront from surface points (GI stand-in)
    r = 1 << 20
    rng = np.random.default_rng(0)
    org0, d0 = camera_rays(view, w, h)
    org0 = np.asarray(org0.reshape(-1, 3))
    d0 = np.asarray(d0.reshape(-1, 3))
    tt = np.asarray(hit.t).ravel()
    m = np.isfinite(tt) & (tt < 1e29)
    pick = rng.choice(np.nonzero(m)[0], size=r)
    pos = org0[pick] + d0[pick] * tt[pick, None] * 0.999
    dr = rng.normal(size=(r, 3)).astype(np.float32)
    dr /= np.linalg.norm(dr, axis=-1, keepdims=True)
    pos = jnp.asarray(pos, jnp.float32)
    dr = jnp.asarray(dr)

    for sort in (False, True):
        def f(_sort=sort):
            return scene_trace_closest(ts, pos, dr, sort=_sort).t
        ms = device_ms(f, iters=3)
        print(f"divergent {r} rays sort={sort}: {ms:.2f} ms, "
              f"{r/(ms*1e-3)/1e6:.0f} Mray/s")


if __name__ == "__main__":
    main()
