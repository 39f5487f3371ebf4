"""Emissive triangle light sampling (NEE), shared by the path tracer, the
GI hit lighting, and the triangle-light specular pass.

Counterpart of `assets/shaders/inc/lights/triangle.hlsl` + the light list in
frame constants (`world_renderer.rs:741-773,1036-1056`).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import smallvec as smv

from ..brdf.sampling import uniform_triangle
from ..core import rng as rng_mod


def sample_triangle_light(ts, pos, rng):
    """Pick one emissive triangle + point on it, uniformly over lights.

    pos: (R, 3) shading points. Returns (dict(wi, dist, pdf_sa, emission,
    valid), rng'). pdf_sa is the solid-angle pdf including light selection.
    """
    n_lights = jnp.maximum(ts.gpu.num_lights, 1)
    u_l, rng = rng_mod.rand_u01(rng)
    li = jnp.minimum((u_l * n_lights).astype(jnp.int32), n_lights - 1)
    u1, rng = rng_mod.rand_u01(rng)
    u2, rng = rng_mod.rand_u01(rng)
    b1, b2 = uniform_triangle(u1, u2)
    # ONE packed fetch for all per-light columns. Separate narrow gathers
    # were ~17 ms/frame at 1080p (a 1-wide f32 gather costs ~6.6 ns/row on
    # the serial path; a 16-wide row costs 1.3 ns — and a small table rides
    # the one-hot MXU path entirely, ops/gather.py::fetch_rows_t).
    from ..ops.gather import fetch_rows_t

    packed = jnp.concatenate(
        [ts.light_v0, ts.light_e1, ts.light_e2, ts.light_normal,
         ts.light_emission, ts.light_area[:, None]], axis=-1)   # (L, 16)
    rows = fetch_rows_t(packed, li)                             # (16, R)
    lv0, le1, le2 = rows[0:3].T, rows[3:6].T, rows[6:9].T
    l_n = rows[9:12].T
    emission = rows[12:15].T
    area = rows[15]
    lp = lv0 + le1 * b1[:, None] + le2 * b2[:, None]

    to_l = lp - pos
    dist2 = smv.dot3(to_l, to_l)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    wi = to_l / dist[:, None]
    cos_l = jnp.abs(smv.dot3(l_n, wi))   # double-sided emitters
    pdf_sa = dist2 / jnp.maximum(cos_l * area * n_lights.astype(jnp.float32), 1e-9)
    valid = (ts.gpu.num_lights > 0) & (area > 0.0) & (cos_l > 1e-6)
    return dict(wi=wi, dist=dist, pdf_sa=pdf_sa, emission=emission,
                valid=valid), rng


def light_pdf_for_hit(ts, hit, wi):
    """Solid-angle pdf NEE would assign to a BRDF-sampled emissive hit (for
    MIS). hit.tri indexes global triangles."""
    n_lights = jnp.maximum(ts.gpu.num_lights, 1).astype(jnp.float32)
    matches = ts.gpu.light_tri[None, :] == hit.tri[:, None]     # (R, L)
    is_light = jnp.any(matches, axis=-1)
    area = jnp.sum(jnp.where(matches, ts.light_area[None, :], 0.0), axis=-1)
    tri = jnp.maximum(hit.tri, 0)
    l_n = smv.normalize3(jnp.cross(ts.e1[tri], ts.e2[tri]), eps=1e-12)
    cos_l = jnp.abs(smv.dot3(l_n, wi))
    dist2 = hit.t * hit.t
    pdf = dist2 / jnp.maximum(cos_l * area * n_lights, 1e-9)
    return jnp.where(is_light & (area > 0), pdf, 0.0)
