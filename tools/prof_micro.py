"""Microbenchmarks on the real chip: gather cost, bilinear warp cost,
woop intersect (XLA vs Pallas) — the data that decides where Pallas kernels
are worth writing. Run: python tools/prof_micro.py [names...]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1080, 1920
R = H * W


def timeit(name, fn, *args, iters=8, warmup=2):
    f = jax.jit(fn)
    try:
        for _ in range(warmup):
            out = f(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = f(*args)
            jax.block_until_ready(out)
            ts.append((time.perf_counter() - t0) * 1e3)
        print(f"{name:44s} {np.median(ts):9.3f} ms")
        return np.median(ts)
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:100]}")
        return None


def main():
    names = set(sys.argv[1:])

    def want(n):
        return not names or n in names

    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)

    if want("gather"):
        img = jax.random.normal(key, (H, W, 4))
        iy = jax.random.randint(key, (H, W), 0, H)
        ix = jax.random.randint(key, (H, W), 0, W)
        timeit("gather 2M rows of (H,W,4)", lambda a, y, x: a[y, x], img, iy, ix)
        img1 = jax.random.normal(key, (H, W))
        timeit("gather 2M scalars of (H,W)", lambda a, y, x: a[y, x], img1, iy, ix)
        img16 = jax.random.normal(key, (H, W, 16))
        timeit("gather 2M rows of (H,W,16)", lambda a, y, x: a[y, x], img16, iy, ix)
        flat = img.reshape(-1, 4)
        fi = (iy * W + ix).reshape(-1)
        timeit("take 2M rows of (HW,4)", lambda a, i: jnp.take(a, i, axis=0),
               flat, fi)
        # gather along last axis only (within-row)
        timeit("within-row gather (H,W)[y,:] perm x",
               lambda a, x: jnp.take_along_axis(a, x, axis=1), img1, ix)

    if want("bilinear"):
        from kajiya_tpu.core import img as im

        img = jax.random.normal(key, (H, W, 4))
        uv = im.pixel_uv(H, W) + jax.random.normal(key, (H, W, 2)) * 0.01
        timeit("sample_bilinear (H,W,4) full res",
               lambda a, u: im.sample_bilinear(a, u), img, uv)

    if want("woop"):
        from kajiya_tpu.core.camera import camera_rays, make_view_constants
        from kajiya_tpu.scene.procedural import cornell_box
        from kajiya_tpu.scene.scene import build_gpu_scene
        from kajiya_tpu.world import build_trace_scene

        gpu = build_gpu_scene(cornell_box())
        ts, levels = build_trace_scene(gpu)
        view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                                   fov_y_deg=55.0, width=W, height=H)
        org, d = camera_rays(view, W, H)
        org = org.reshape(-1, 3)
        d = d.reshape(-1, 3)

        from kajiya_tpu.ops.woop import intersect_brute

        timeit("woop XLA intersect 2M rays cornell",
               lambda o, dd: intersect_brute(ts.woop, o, dd), org, d)

        from kajiya_tpu.ops.woop_pallas import intersect_brute_pallas

        timeit("woop PALLAS intersect 2M rays cornell",
               lambda o, dd: intersect_brute_pallas(ts.woop, o, dd), org, d)

    if want("filters"):
        from kajiya_tpu.core import img as im

        img = jax.random.normal(key, (H, W, 3))
        img1 = jax.random.normal(key, (H, W))
        timeit("local_moments_3x3 (H,W,3)", im.local_moments_3x3, img)
        timeit("separable_blur GAUSS5 (H,W)",
               lambda a: im.separable_blur(a, im.GAUSS5), img1)
        timeit("upsample2x_bilinear (H/2,W/2,3)",
               im.upsample2x_bilinear, img[::2, ::2])
        timeit("sample_const_offset (H,W,3)",
               lambda a: im.sample_const_offset(a, 0.3, -0.2), img)

    if want("passes"):
        from kajiya_tpu.core.camera import make_view_constants
        from kajiya_tpu.frame import RenderConfig, init_frame_state
        from kajiya_tpu.scene.procedural import cornell_box
        from kajiya_tpu.scene.scene import build_gpu_scene
        from kajiya_tpu.world import build_trace_scene

        gpu = build_gpu_scene(cornell_box())
        ts, levels = build_trace_scene(gpu)
        view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                                   fov_y_deg=55.0, width=W, height=H)
        cfg = RenderConfig(width=W, height=H, max_trace_steps=96)

        from kajiya_tpu.renderers import gbuffer as gb_mod

        timeit("gbuffer raytrace 1080p",
               lambda t, v: gb_mod.raytrace_gbuffer(t, v, W, H), ts, view)

        gb = jax.jit(lambda t, v: gb_mod.raytrace_gbuffer(t, v, W, H))(ts, view)
        state = init_frame_state(cfg)

        from kajiya_tpu.renderers import reprojection as rp

        timeit("reprojection map",
               lambda g, pd, v: rp.calculate_reprojection_map(g, pd, v),
               gb, state["prev_depth"], view)
        reproj = jax.jit(
            lambda g, pd, v: rp.calculate_reprojection_map(g, pd, v))(
            gb, state["prev_depth"], view)

        from kajiya_tpu.renderers import taa as taa_mod

        timeit("taa",
               lambda lit, st, rj: taa_mod.taa(
                   lit, st, rj, jnp.zeros(2), H, W),
               jnp.abs(jax.random.normal(key, (H, W, 3))),
               {"taa_history": state["taa_history"],
                "taa_valid": state["taa_valid"]}, reproj)

        from kajiya_tpu.renderers import shadows as sh_mod

        timeit("shadow trace",
               lambda t, g: sh_mod.trace_sun_shadow_mask(t, g, 0,
                                                         max_trace_steps=96),
               ts, gb)
        mask = jax.jit(lambda t, g: sh_mod.trace_sun_shadow_mask(
            t, g, 0, max_trace_steps=96))(ts, gb)
        timeit("shadow denoise",
               lambda m, st, rj, g: sh_mod.denoise(m, st, rj, g),
               mask, {"moments": state["moments"],
                      "history_len": state["history_len"]}, reproj, gb)

        from kajiya_tpu.renderers import motion_blur as mb

        timeit("motion blur",
               lambda a, v, dd: mb.motion_blur(a, v, dd),
               jnp.abs(jax.random.normal(key, (H, W, 3))),
               gb["velocity"], gb["depth"])

        from kajiya_tpu.renderers import ssgi as ssgi_mod

        timeit("ssao pipeline",
               lambda g, st, rj: ssgi_mod.ssao_pipeline(
                   g, view, 0, st, rj),
               gb, {"ssao_history": state["ssao_history"]}, reproj)


if __name__ == "__main__":
    main()
