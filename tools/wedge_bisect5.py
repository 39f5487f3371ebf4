import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np

key = jax.random.PRNGKey(0)
def probe(tag):
    H, W = 1080, 1920
    img = jnp.zeros((H, W, 4))
    iy = jax.random.randint(key, (H, W), 0, H)
    ix = jax.random.randint(key, (H, W), 0, W)
    g = jax.jit(lambda a, y, x: a[y, x] * 2.0)
    out = g(img, iy, ix); jax.block_until_ready(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); out = g(img, iy, ix); jax.block_until_ready(out)
        ts.append((time.perf_counter()-t0)*1e3)
    print(f"  [probe {tag:6s}] {np.median(ts):8.3f} ms", flush=True)

from kajiya_tpu.ops.hoist import jit_hoisted
from kajiya_tpu.core.camera import make_view_constants, camera_rays
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene, refresh_trace_scene, hit_attributes

def run(name, f, *a):
    g = jit_hoisted(f)
    out = g(*a); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = g(*a); jax.block_until_ready(out)
    print(f"{name:52s} {(time.perf_counter()-t0)*1e3:8.3f} ms", flush=True)

import os
W, H = int(os.environ.get('BW', 512)), int(os.environ.get('BH', 288))
gpu = build_gpu_scene(cornell_box())
ts_, levels = build_trace_scene(gpu)
view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                           fov_y_deg=55.0, width=W, height=H)
which = sys.argv[1]
probe("pre")
if which == "camrays":
    run("camera_rays", lambda v: camera_rays(v, W, H), view)
elif which == "refresh":
    run("refresh_trace_scene", lambda g, b: refresh_trace_scene(g, b, levels).tri_attrs, ts_.gpu, ts_.bvh)
elif which == "gbuffer":
    from kajiya_tpu.renderers.gbuffer import raytrace_gbuffer
    run("raytrace_gbuffer", lambda t, v: raytrace_gbuffer(t, v, W, H, max_trace_steps=96)["depth"], ts_, view)
elif which == "trace_attrs":
    from kajiya_tpu.rt.trace import scene_trace_closest
    def f(t, v):
        org, d = camera_rays(v, W, H)
        hit = scene_trace_closest(t, org.reshape(-1, 3), d.reshape(-1, 3))
        return hit_attributes(t, hit, d.reshape(-1, 3))["base_color"]
    run("trace + hit_attributes", f, ts_, view)
elif which == "reproj":
    from kajiya_tpu.renderers.gbuffer import raytrace_gbuffer
    from kajiya_tpu.renderers.reprojection import calculate_reprojection_map
    gb = jit_hoisted(lambda t, v: raytrace_gbuffer(t, v, W, H, max_trace_steps=96))(ts_, view)
    jax.block_until_ready(gb["depth"])
    probe("mid")
    run("reprojection", lambda g, v: calculate_reprojection_map(g, jnp.zeros((H, W)), v)["prev_uv"], gb, view)
elif which == "deferred1080":
    from kajiya_tpu.renderers.gbuffer import raytrace_gbuffer
    from kajiya_tpu.renderers import deferred as df
    from kajiya_tpu.sky.atmosphere import sky_radiance
    from kajiya_tpu.sky import env as env_mod
    gb = jit_hoisted(lambda t, v: raytrace_gbuffer(t, v, W, H, max_trace_steps=96))(ts_, view)
    jax.block_until_ready(gb["depth"])
    probe("mid")
    def f(g, sd):
        dgi = jnp.full((H, W, 3), 0.2)
        refl = jnp.full((H, W, 3), 0.1)
        sky_bg = jnp.full((H, W, 3), 0.5)
        return df.light_gbuffer(g, jnp.ones((H, W)), dgi, refl, sky_bg,
                                ts_.gpu.sun_radiance, sd)
    run("light_gbuffer 1080p", f, gb, ts_.gpu.sun_direction)
elif which == "post1080":
    from kajiya_tpu.renderers import post as post_mod
    lit = jnp.abs(jax.random.normal(key, (H, W, 3)))
    def f(x):
        expo, st = post_mod.update_exposure({"smoothed_ev": jnp.float32(0.0)}, x)
        return post_mod.post_combine(x, expo), st["smoothed_ev"]
    run("exposure+post_combine 1080p", f, lit)
elif which == "minframe":
    from kajiya_tpu.frame import RenderConfig, init_frame_state, render_frame
    cfg = RenderConfig(width=W, height=H, max_trace_steps=96,
                       use_ircache=False, use_rtdgi=False, use_rtr=False,
                       use_taa=False, use_motion_blur=False, use_ssao=False,
                       sun_soft_shadows=False)
    state = init_frame_state(cfg)
    step = jit_hoisted(lambda s: render_frame(ts_, s, view, cfg, levels=levels))
    s2, out = step(state)
    jax.block_until_ready(out["final"])
    t0 = time.perf_counter(); s3, out = step(s2); jax.block_until_ready(out["final"])
    wall = (time.perf_counter()-t0)*1e3
    e = float(np.asarray(out["exposure"]))
    t0 = time.perf_counter(); s4, out = step(s3); e = float(np.asarray(out["exposure"]))
    print(f"minframe {W}x{H}: block={wall:.1f} ms scalar-sync={(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
elif which == "refresh_woop":
    run("refresh -> woop a_o", lambda g, b: refresh_trace_scene(g, b, levels).woop["a_o"].sum(), ts_.gpu, ts_.bvh)
elif which == "buildwoop":
    from kajiya_tpu.ops.woop import build_woop, TRI_BLOCK
    v0, e1, e2 = ts_.v0, ts_.e1, ts_.e2
    pad = -(-v0.shape[0] // TRI_BLOCK) * TRI_BLOCK
    run("build_woop alone", lambda a, b, c: build_woop(a, b, c, pad_to=pad)["a_o"].sum(), v0, e1, e2)
elif which == "refresh_gb":
    from kajiya_tpu.renderers.gbuffer import raytrace_gbuffer
    def f(g, b, v):
        ts2 = refresh_trace_scene(g, b, levels)
        return raytrace_gbuffer(ts2, v, W, H, max_trace_steps=96)["depth"]
    run("refresh + gbuffer", f, ts_.gpu, ts_.bvh, view)
elif which == "argwoop_gb":
    from kajiya_tpu.renderers.gbuffer import raytrace_gbuffer
    def f(g, b, v):
        ts2 = refresh_trace_scene(g, b, levels)
        import dataclasses
        ts3 = dataclasses.replace(ts2, woop=ts_.woop)   # woop from ARGS
        return raytrace_gbuffer(ts3, v, W, H, max_trace_steps=96)["depth"]
    run("refresh(attrs) + gbuffer(arg woop)", f, ts_.gpu, ts_.bvh, view)
elif which == "skybg":
    from kajiya_tpu.sky.atmosphere import sky_radiance
    from kajiya_tpu.sky import env as env_mod
    from kajiya_tpu.core import img as im
    def f(v, sd):
        org, d = camera_rays(v, W, H)
        sky_q = env_mod.sample_env(lambda dd: sky_radiance(dd, sd),
                                   d[::4, ::4].reshape(-1, 3)).reshape(H//4, W//4, 3)
        return im.upsample2x_bilinear(im.upsample2x_bilinear(sky_q))
    run("sky quarter+upsample", f, view, ts_.gpu.sun_direction)
probe("post")
