"""Synthetic energy test of the ReSTIR GI stack, NEAR-FIELD configuration:
receivers spread across a wall at z=0 (world extent ~4 units), radiance
comes from a bright disk on a parallel plane at z=2. Spatial reuse between
receivers then involves real parallax — exactly the configuration where
direction-reuse without reconnection/jacobian loses energy. Ground truth =
plain per-pixel MC over the same candidate stream."""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from kajiya_tpu.renderers import restir_gi
from kajiya_tpu.core import rng as rng_mod
from kajiya_tpu.brdf.sampling import cosine_hemisphere, to_world

H, W = 96, 128          # full res -> half 48x64
hh, hw = H // 2, W // 2
L_BRIGHT = 20.0
PLANE_Z = 2.0
PATCH_R = 0.8           # bright disk radius on the z=2 plane
EXTENT = 4.0            # wall extent in world units

normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (hh, hw, 3))
xs = (jnp.arange(hw) + 0.5) / hw * EXTENT - EXTENT / 2
ys = (jnp.arange(hh) + 0.5) / hh * EXTENT * (hh / hw) - EXTENT * (hh / hw) / 2
pos = jnp.stack(jnp.broadcast_arrays(
    xs[None, :], ys[:, None], jnp.zeros(())), -1)          # (hh, hw, 3)

gb_h = {
    "hit": jnp.ones((hh, hw), bool),
    "normal": normal,
    "geo_normal": normal,
    "pos": pos,
    "depth": jnp.full((hh, hw), 0.01 / 3.0),   # vz = 3
}
pos_full = jnp.stack(jnp.broadcast_arrays(
    ((jnp.arange(W) + 0.5) / W * EXTENT - EXTENT / 2)[None, :],
    ((jnp.arange(H) + 0.5) / H * EXTENT * (H / W) - EXTENT * (H / W) / 2)[:, None],
    jnp.zeros(())), -1)
gb_full = {
    "normal": jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (H, W, 3)),
    "depth": jnp.full((H, W), 0.01 / 3.0),
    "pos": pos_full,
}
reproj = {
    "prev_uv": jnp.stack(jnp.meshgrid(
        (jnp.arange(W) + 0.5) / W, (jnp.arange(H) + 0.5) / H), -1),
    "validity": jnp.ones((H, W)),
}


def make_candidates(frame_idx):
    px = jnp.arange(hh * hw, dtype=jnp.uint32)
    rng = rng_mod.pixel_rng(px % jnp.uint32(hw), px // jnp.uint32(hw),
                            jnp.uint32(frame_idx), stream=99)
    u1, rng = rng_mod.rand_u01(rng)
    u2, rng = rng_mod.rand_u01(rng)
    wi = to_world(normal.reshape(-1, 3), cosine_hemisphere(u1, u2))
    p = pos.reshape(-1, 3)
    t = PLANE_Z / jnp.maximum(wi[:, 2], 1e-3)
    hit = p + wi * t[:, None]
    bright = (hit[:, 0] ** 2 + hit[:, 1] ** 2) < PATCH_R ** 2
    rad = jnp.where(bright[:, None], L_BRIGHT, 0.0) * jnp.ones((1, 3))
    return {
        "radiance": rad.reshape(hh, hw, 3),
        "ray_dir": wi.reshape(hh, hw, 3),
        "ray_t": t.reshape(hh, hw),
        "hit_pos": hit.reshape(hh, hw, 3),
        "hit_normal": jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]),
                                       (hh, hw, 3)),
        "valid": jnp.ones((hh, hw), bool),
    }


@jax.jit
def step(state, f):
    cand = make_candidates(f)
    res, new_state = restir_gi.restir_diffuse(state, cand, gb_h, reproj, f)
    full = restir_gi.resolve(res, gb_full)
    return new_state, full, res


state = restir_gi.init_state(H, W)
for f in range(96):
    state, full, res = step(state, f)

full = np.asarray(full)

# ground truth: plain per-pixel MC over many frames of the same stream
acc = 0.0
for f in range(256):
    acc = acc + np.asarray(make_candidates(f)["radiance"])
truth_px = acc / 256
print(f"plain-MC mean(L) = {truth_px.mean():.4f}")
print(f"restir resolve mean = {full.mean():.4f}  "
      f"ratio = {full.mean()/truth_px.mean():.3f}")
# spatial profile: centre column strip vs edges (parallax strongest at edges)
mid = np.repeat(np.repeat(truth_px.mean(-1), 2, 0), 2, 1)   # to full res
est = full.mean(-1)
for name, sl in [("centre", (slice(H//3, 2*H//3), slice(W//3, 2*W//3))),
                 ("edges", (slice(0, H//6), slice(None)))]:
    print(f"  {name}: truth {mid[sl].mean():.4f} restir {est[sl].mean():.4f} "
          f"ratio {est[sl].mean()/max(mid[sl].mean(),1e-9):.3f}")
print(f"mean M = {np.asarray(res['M']).mean():.1f}")
