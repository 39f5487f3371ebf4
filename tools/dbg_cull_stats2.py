"""Cull-design sweep #2: sun-plane planar keys for shadow wavefronts,
two-pass tmax banding with dead-ray carry for GI, and chunk-size scaling —
the visit counts that decide the at-scale tracer design (CPU-only).

Run: PALLAS_AXON_POOL_IPS= python tools/dbg_cull_stats2.py [diorama|city] [W H]
"""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

SCENE = sys.argv[1] if len(sys.argv) > 1 else "diorama"
W, H = (int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 4 else (480, 270)

from kajiya_tpu.core.camera import camera_rays, make_view_constants
from kajiya_tpu.ops.woop_pallas import _active_blocks
from kajiya_tpu.ops.raysort import ray_sort_key
from kajiya_tpu.scene.scene import Scene, build_gpu_scene
from kajiya_tpu.world import build_trace_scene
from kajiya_tpu.rt.trace import scene_trace_closest

if SCENE == "diorama":
    from kajiya_tpu.scene.cache import load_mesh_cached

    scene = Scene()
    scene.add_instance(scene.add_mesh(load_mesh_cached(
        "/root/reference/assets/meshes/pica_pica_-_mini_diorama_01/"
        "scene.gltf")), scale=(0.05, 0.05, 0.05))
    cam = ((0.0, 0.6, 1.4), (0.0, -0.35, -1.0))
else:
    from kajiya_tpu.scene.procedural import city

    scene = city(n=16, subdiv=8)
    cam = ((0.0, 14.0, 28.0), (0.0, -0.45, -1.0))

gpu = build_gpu_scene(scene, with_textures=False)
ts, levels = build_trace_scene(gpu)
woop = ts.woop
C = int(np.isfinite(np.asarray(woop["cmin64"])).all(-1).sum())
print(f"{SCENE}: {int(gpu.num_triangles)} tris, {C} live 128-tri blocks, "
      f"{W}x{H} wavefronts")

view = make_view_constants(cam[0], cam[1], fov_y_deg=55.0, width=W, height=H)
org, d = camera_rays(view, W, H)
org = org.reshape(-1, 3)
d = d.reshape(-1, 3)
hit = scene_trace_closest(ts, org, d)
m = np.asarray(hit.hit_mask)
t = np.asarray(hit.t)
pos = np.asarray(org) + np.asarray(d) * np.where(m, t, 1.0)[:, None]

sun = np.array([0.35, 0.8, 0.5]); sun /= np.linalg.norm(sun)
rng = np.random.default_rng(1)
u1, u2 = rng.random(len(pos)), rng.random(len(pos))
z = np.sqrt(u1); r_ = np.sqrt(1 - u1)
phi = 2 * np.pi * u2
gi_d = np.stack([r_ * np.cos(phi), z, r_ * np.sin(phi)], -1).astype(np.float32)

smin = jnp.min(woop["cmin64"], axis=0)
smax = jnp.max(woop["cmax64"], axis=0)
diag = float(jnp.linalg.norm(smax - smin))


def scene_tmax(o, dd):
    deps = 1e-12
    dinv = 1.0 / jnp.where(jnp.abs(dd) < deps,
                           jnp.where(dd < 0, -deps, deps), dd)
    ta = (smin[None] - o) * dinv
    tb_ = (smax[None] - o) * dinv
    tfar = jnp.maximum(ta, tb_).min(-1)
    tnear = jnp.maximum(jnp.minimum(ta, tb_).max(-1), 0.0)
    return jnp.where(tfar >= tnear, tfar * 1.001 + 1e-3, 0.0)


def counts(oo, dd2, tm, rb):
    rpad = (-oo.shape[0]) % rb
    if rpad:
        oo = jnp.concatenate([oo, jnp.zeros((rpad, 3))])
        dd2 = jnp.concatenate([dd2, jnp.ones((rpad, 3))])
        tm = jnp.concatenate([tm, jnp.zeros((rpad,))])
    nrb = oo.shape[0] // rb
    _bl, _bd, count = _active_blocks(woop, oo, dd2, tm, nrb, rb)
    return np.asarray(count)


def est_ms_per_mray(c, rb, rtot):
    # visit cost scales with rows: 2.36 us is the (512,128) figure
    per_visit = 2.36 * rb / 512.0
    return (c.sum() * per_visit + len(c) * 4.2) / 1e3 / (rtot / 1e6)


def planar_key(o, axis_dir, bits=8):
    """2D morton of origins projected on the plane perpendicular to
    axis_dir — same-direction wavefronts become thin columns."""
    a = np.asarray(axis_dir, np.float64)
    up = np.array([0.0, 1.0, 0.0]) if abs(a[1]) < 0.9 else np.array([1.0, 0, 0])
    u = np.cross(a, up); u /= np.linalg.norm(u)
    v = np.cross(a, u)
    on = np.asarray(o)
    pu = on @ u.astype(np.float32)
    pv = on @ v.astype(np.float32)
    qu = np.clip(((pu - pu.min()) / max(np.ptp(pu), 1e-6)) * (1 << bits),
                 0, (1 << bits) - 1).astype(np.uint32)
    qv = np.clip(((pv - pv.min()) / max(np.ptp(pv), 1e-6)) * (1 << bits),
                 0, (1 << bits) - 1).astype(np.uint32)
    key = np.zeros_like(qu)
    for b in range(bits):
        key |= ((qu >> b) & 1) << (2 * b + 1)
        key |= ((qv >> b) & 1) << (2 * b)
    return key


o_sh = jnp.asarray(pos[m]); d_sh = jnp.asarray(np.broadcast_to(sun, pos[m].shape))
o_gi = jnp.asarray(pos[m]); d_gi = jnp.asarray(gi_d[m])
rtot = int(o_sh.shape[0])

print("== shadow: 3D mixed key vs sun-plane 2D key, rb sweep ==")
tm = scene_tmax(o_sh, d_sh)
for rb in (128, 256, 512):
    perm = jnp.argsort(ray_sort_key(o_sh, d_sh, smin, smax))
    c = counts(o_sh[perm], d_sh[perm], tm[perm], rb)
    print(f"  mixed3d rb={rb:4d}: mean {c.mean():6.1f} visits  "
          f"est {est_ms_per_mray(c, rb, rtot):7.1f} ms/Mray")
for rb in (128, 256, 512):
    perm = jnp.asarray(np.argsort(planar_key(o_sh, sun)))
    c = counts(o_sh[perm], d_sh[perm], tm[perm], rb)
    print(f"  planar  rb={rb:4d}: mean {c.mean():6.1f} visits  "
          f"est {est_ms_per_mray(c, rb, rtot):7.1f} ms/Mray")

print("== gi: two-pass banding with dead-ray carry (sorted once) ==")
th = np.asarray(scene_trace_closest(ts, o_gi, d_gi).t)
tm_gi = scene_tmax(o_gi, d_gi)
for rb in (128, 256, 512):
    for frac in (0.1, 0.2, 0.35):
        perm = np.asarray(jnp.argsort(ray_sort_key(o_gi, d_gi, smin, smax,
                                                   3, 2)))
        op, dp = o_gi[perm], d_gi[perm]
        tmp = np.asarray(tm_gi)[perm]
        thp = th[perm]
        r1 = frac * diag
        c1 = counts(op, dp, jnp.asarray(np.minimum(tmp, r1)), rb)
        # pass 2: only rays that neither hit within r1 nor ended (tmax<r1)
        miss = (thp > r1) & (tmp > r1)
        tm2 = np.where(miss, tmp, 0.0).astype(np.float32)
        c2 = counts(op, dp, jnp.asarray(tm2), rb)
        e1 = est_ms_per_mray(c1, rb, rtot)
        e2 = est_ms_per_mray(c2, rb, rtot)
        print(f"  rb={rb:4d} band {frac:4.2f}: p1 mean {c1.mean():6.1f} "
              f"(est {e1:6.1f}) + p2 [{int(miss.sum()):6d} rays] mean "
              f"{c2.mean():6.1f} (est {e2:6.1f})  TOTAL {e1 + e2:7.1f} "
              f"ms/Mray")
print("== gi: single-pass key/rb reference ==")
for rb in (128, 256, 512):
    perm = jnp.argsort(ray_sort_key(o_gi, d_gi, smin, smax, 3, 2))
    c = counts(o_gi[perm], d_gi[perm], tm_gi[perm], rb)
    print(f"  mixed o3d2 rb={rb:4d}: mean {c.mean():6.1f} visits  "
          f"est {est_ms_per_mray(c, rb, rtot):7.1f} ms/Mray")
