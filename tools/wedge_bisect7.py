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
from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene, refresh_trace_scene
from kajiya_tpu.renderers import deferred, gbuffer, post, reprojection
from kajiya_tpu.sky import env as sky_env_mod
from kajiya_tpu.sky.atmosphere import sky_radiance
from kajiya_tpu.core import img as im

W, H = 512, 288
gpu = build_gpu_scene(cornell_box())
ts_, levels = build_trace_scene(gpu)
view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                           fov_y_deg=55.0, width=W, height=H)
stage = sys.argv[1]

def frame(state, upto):
    ts2 = refresh_trace_scene(ts_.gpu, ts_.bvh, levels)
    gb = gbuffer.raytrace_gbuffer(ts2, view, W, H, max_trace_steps=96)
    out = gb["albedo"]
    if upto >= 1:
        reproj = reprojection.calculate_reprojection_map(
            gb, state["prev_depth"], view)
        out = out + reproj["validity"][..., None]
    if upto >= 2:
        sun_dir = ts2.gpu.sun_direction
        small = sky_env_mod.build_sky_env(sun_dir, res=32)
        diffuse_env = sky_env_mod.sh9_irradiance_fn(
            sky_env_mod.project_sh9(small))
        dgi = sky_env_mod.sample_env(diffuse_env, gb["normal"].reshape(-1, 3)
                                     ).reshape(H, W, 3)
        out = out + dgi
    if upto >= 3:
        sky_env = lambda d: sky_radiance(d, ts2.gpu.sun_direction, steps=6)
        rdir = gb["ray_dir"] - 2.0 * jnp.sum(
            gb["ray_dir"] * gb["normal"], -1, keepdims=True) * gb["normal"]
        refl = sky_env_mod.sample_env(sky_env, rdir.reshape(-1, 3)).reshape(H, W, 3)
        out = out + refl
    if upto >= 4:
        sky_bg_fn = lambda d: sky_radiance(d, ts2.gpu.sun_direction)
        sky_q = sky_env_mod.sample_env(
            sky_bg_fn, gb["ray_dir"][::4, ::4].reshape(-1, 3)
        ).reshape(H // 4, W // 4, 3)
        sky_bg = im.upsample2x_bilinear(im.upsample2x_bilinear(sky_q))
        lit = deferred.light_gbuffer(
            gb, jnp.ones((H, W)), out, out, sky_bg,
            ts_.gpu.sun_radiance, ts_.gpu.sun_direction)
        out = lit
    if upto >= 5:
        expo, est = post.update_exposure({"smoothed_ev": state["smoothed_ev"]}, out)
        out = post.post_combine(out, expo)
    new_state = {"prev_depth": gb["depth"],
                 "smoothed_ev": state.get("smoothed_ev", jnp.float32(0.0)) * 0 + out.mean()}
    return new_state, out

state = {"prev_depth": jnp.zeros((H, W)), "smoothed_ev": jnp.asarray(0.0)}
upto = int(stage)
probe("pre")
step = jit_hoisted(lambda s: frame(s, upto))
s2, out = step(state)
e = float(np.asarray(out).mean())
t0 = time.perf_counter(); s3, out = step(s2); e = float(np.asarray(out).mean())
print(f"stage {upto}: {(time.perf_counter()-t0)*1e3:.1f} ms (sync via mean readback)", flush=True)
probe("post")
