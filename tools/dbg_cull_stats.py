"""Cull-quality diagnostic: visited-block statistics per 512-ray chunk for
the real frame wavefronts (primary, sun shadow, GI hemisphere) on a chosen
scene — CPU-only, no TPU claim (PALLAS_AXON_POOL_IPS= python ...).

Per wavefront, prints the chunk visit-count distribution for:
  unsorted (screen order)  |  sorted (ops/raysort key order)
Visits x 2.36 us = the culled kernel's predicted cost (docs round-4 model),
so this table says where the diorama's 6.1 s/frame actually comes from and
what sorting buys before we burn TPU time measuring it.
"""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

SCENE = sys.argv[1] if len(sys.argv) > 1 else "diorama"
W, H = (int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 4 else (480, 270)

from kajiya_tpu.core.camera import camera_rays, make_view_constants
from kajiya_tpu.ops.woop_pallas import CULL_RAY_BLOCK, _active_blocks
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
print(f"{SCENE}: {int(gpu.num_triangles)} tris, {C} live 128-tri blocks")

view = make_view_constants(cam[0], cam[1], fov_y_deg=55.0, width=W, height=H)
org, d = camera_rays(view, W, H)
org = org.reshape(-1, 3)
d = d.reshape(-1, 3)

hit = scene_trace_closest(ts, org, d)
m = np.asarray(hit.hit_mask)
t = np.asarray(hit.t)
pos = np.asarray(org) + np.asarray(d) * np.where(m, t, 1.0)[:, None]
print(f"primary hit rate {m.mean():.2f}")

sun = np.array([0.35, 0.8, 0.5]); sun /= np.linalg.norm(sun)
rng = np.random.default_rng(1)

# hemisphere GI directions around +normal-ish (use geometric up as a stand-in
# normal mix: direction-diverse like real GI candidates)
u1, u2 = rng.random(len(pos)), rng.random(len(pos))
z = np.sqrt(u1); r_ = np.sqrt(1 - u1)
phi = 2 * np.pi * u2
gi_d = np.stack([r_ * np.cos(phi), z, r_ * np.sin(phi)], -1).astype(np.float32)

wavefronts = {
    "shadow(sun)": (pos[m], np.broadcast_to(sun, pos[m].shape)),
    "gi(hemi)": (pos[m], gi_d[m]),
}

def stats(name, o, dd):
    o = jnp.asarray(o, jnp.float32)
    dd = jnp.asarray(dd, jnp.float32)
    rtot = o.shape[0]
    rb = CULL_RAY_BLOCK
    smin = jnp.min(woop["cmin64"], axis=0)
    smax = jnp.max(woop["cmax64"], axis=0)
    # same tmax tightening as intersect_culled_pallas
    deps = 1e-12
    dinv = 1.0 / jnp.where(jnp.abs(dd) < deps,
                           jnp.where(dd < 0, -deps, deps), dd)
    ta = (smin[None] - o) * dinv
    tb_ = (smax[None] - o) * dinv
    tfar = jnp.maximum(ta, tb_).min(-1)
    tnear = jnp.maximum(jnp.minimum(ta, tb_).max(-1), 0.0)
    tmax = jnp.where(tfar >= tnear, tfar * 1.001 + 1e-3, 0.0)

    def counts(oo, dd2, tm):
        rpad = (-oo.shape[0]) % rb
        if rpad:
            oo = jnp.concatenate([oo, jnp.zeros((rpad, 3))])
            dd2 = jnp.concatenate([dd2, jnp.ones((rpad, 3))])
            tm = jnp.concatenate([tm, jnp.zeros((rpad,))])
        nrb = oo.shape[0] // rb
        _bl, _bd, count = _active_blocks(woop, oo, dd2, tm, nrb, rb)
        return np.asarray(count)

    def report(label, c, r=None):
        est = (c.sum() * 2.36 + len(c) * 4.2) / 1e3
        est_mray = est / (rtot / 1e6)
        print(f"  {name:13s} {label:16s}: visits/chunk "
              f"p50={np.median(c):5.0f} p90={np.percentile(c, 90):5.0f} "
              f"mean={c.mean():6.1f}/{C}  est {est_mray:7.1f} ms/Mray")
        return est_mray

    report("unsorted", counts(o, dd, tmax))
    for ob, db in ((3, 2), (4, 3), (5, 3), (6, 3)):
        perm = jnp.argsort(ray_sort_key(o, dd, smin, smax, ob, db))
        report(f"sorted o{ob}d{db}", counts(o[perm], dd[perm], tmax[perm]))

    # banded waves: tmax clamped per wave, misses (t hit beyond the band or
    # none within it) re-traced at the next band; estimate assumes hits are
    # definitive within a band (conservative sphere cull guarantees it)
    diag = float(jnp.linalg.norm(smax - smin))
    hitb = scene_trace_closest(ts, o, dd)       # oracle distances for sim
    th = np.asarray(hitb.t)
    tot = 0.0
    live = np.ones(rtot, bool)
    for frac in (0.12, 0.35, 1.01):
        r_band = frac * diag
        lo, ld = np.asarray(o)[live], np.asarray(dd)[live]
        tm_band = np.minimum(np.asarray(tmax)[live], r_band)
        perm = np.asarray(jnp.argsort(ray_sort_key(
            jnp.asarray(lo), jnp.asarray(ld), smin, smax)))
        c = counts(jnp.asarray(lo[perm]), jnp.asarray(ld[perm]),
                   jnp.asarray(tm_band[perm]))
        est = (c.sum() * 2.36 + len(c) * 4.2) / 1e3 / (rtot / 1e6)
        tot += est
        nlive = int(live.sum())
        live = live & ~(th <= r_band)
        print(f"  {name:13s} band {frac:4.2f} ({nlive:7d} rays): "
              f"mean {c.mean():6.1f} visits  est {est:7.1f} ms/Mray")
    print(f"  {name:13s} banded TOTAL est {tot:7.1f} ms/Mray")

for name, (o, dd) in wavefronts.items():
    stats(name, o, dd)
