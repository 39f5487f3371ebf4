"""Lockstep wavefront BVH traversal in JAX — the software `TraceRay`.

Replaces the reference's hardware ray-tracing pipelines and its two payload
types (`assets/shaders/inc/rt.hlsl:8-130`): `trace_closest` ~ the gbuffer
payload path (`GbufferRaytrace::trace`), `trace_shadow` ~ `rt_is_shadowed`.

Design for TPU:
  * every ray in the batch advances in lockstep through a `lax.while_loop`;
    per-ray state is ONE node index (skip-link BVH, see bvh.py) plus the
    current best hit — no traversal stacks, so state stays in registers/VMEM;
  * leaf runs are `leaf_size`-aligned so triangle intersection is a static
    unrolled loop of vectorized Moller-Trumbore tests (pure VPU work);
  * finished rays park at node == N and are masked; the loop ends when the
    LAST ray finishes. Callers should sort/batch coherent rays when possible.

All functions take flat (R,) ray batches; callers reshape images to flat.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

INF = jnp.float32(1e30)


@jax.tree_util.register_pytree_node_class
@dataclass
class Hit:
    """Closest-hit payload (~ `GbufferRayPayload`, inc/rt.hlsl)."""
    t: Any        # (R,) f32, INF = miss
    tri: Any      # (R,) i32, -1 = miss
    u: Any        # (R,) f32 barycentric
    v: Any        # (R,) f32 barycentric

    def tree_flatten(self):
        return (self.t, self.tri, self.u, self.v), None

    @classmethod
    def tree_unflatten(cls, _aux, ch):
        return cls(*ch)

    @property
    def hit_mask(self):
        return self.tri >= 0


def _safe_inv(d):
    eps = jnp.float32(1e-12)
    return 1.0 / jnp.where(jnp.abs(d) < eps, jnp.where(d < 0, -eps, eps), d)


def _aabb_hit(org, inv_d, bmin, bmax, t_max):
    t0 = (bmin - org) * inv_d
    t1 = (bmax - org) * inv_d
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tn <= tf) & (tf >= 0.0) & (tn <= t_max)


def _tri_intersect(org, d, v0, e1, e2):
    """Vectorized Moller-Trumbore. Returns (t, u, v, valid). Double-sided."""
    pvec = jnp.cross(d, e2)
    det = jnp.einsum("...i,...i->...", e1, pvec)
    valid = jnp.abs(det) > 1e-12
    inv_det = 1.0 / jnp.where(valid, det, 1.0)
    tvec = org - v0
    u = jnp.einsum("...i,...i->...", tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.einsum("...i,...i->...", d, qvec) * inv_det
    t = jnp.einsum("...i,...i->...", e2, qvec) * inv_det
    valid &= (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return t, u, v, valid


def _traverse(bvh, tris, org, d, t_min, t_max, any_hit: bool, max_steps: int | None):
    v0s, e1s, e2s = tris
    n_nodes = bvh.num_nodes
    inv_d = _safe_inv(d)
    R = org.shape[0]
    L = bvh.leaf_size

    state = dict(
        node=jnp.zeros((R,), jnp.int32),
        t=jnp.asarray(jnp.broadcast_to(t_max, (R,)), jnp.float32),
        tri=jnp.full((R,), -1, jnp.int32),
        u=jnp.zeros((R,), jnp.float32),
        v=jnp.zeros((R,), jnp.float32),
        steps=jnp.zeros((), jnp.int32),
    )

    def cond(st):
        alive = jnp.any(st["node"] < n_nodes)
        if max_steps is not None:
            alive &= st["steps"] < max_steps
        return alive

    def body(st):
        node = st["node"]
        active = node < n_nodes
        safe_node = jnp.where(active, node, 0)
        bmin = bvh.node_min[safe_node]
        bmax = bvh.node_max[safe_node]
        count = bvh.node_count[safe_node]
        first = bvh.node_first[safe_node]
        skip = bvh.node_skip[safe_node]

        box_hit = _aabb_hit(org, inv_d, bmin, bmax, st["t"]) & active
        is_leaf = count > 0
        do_leaf = box_hit & is_leaf

        t_best, tri_best = st["t"], st["tri"]
        u_best, v_best = st["u"], st["v"]
        for k in range(L):
            tid = bvh.tri_order[jnp.where(do_leaf, first + k, 0)]
            tri_ok = do_leaf & (k < count) & (tid >= 0)
            safe_tid = jnp.maximum(tid, 0)
            t, u, v, tvalid = _tri_intersect(org, d, v0s[safe_tid], e1s[safe_tid], e2s[safe_tid])
            closer = tri_ok & tvalid & (t > t_min) & (t < t_best)
            t_best = jnp.where(closer, t, t_best)
            tri_best = jnp.where(closer, tid, tri_best)
            u_best = jnp.where(closer, u, u_best)
            v_best = jnp.where(closer, v, v_best)

        next_node = jnp.where(box_hit & ~is_leaf, node + 1, skip)
        if any_hit:
            # shadow rays park as soon as anything is hit
            next_node = jnp.where(tri_best >= 0, n_nodes, next_node)
        next_node = jnp.where(active, next_node, n_nodes)

        return dict(node=next_node, t=t_best, tri=tri_best, u=u_best, v=v_best,
                    steps=st["steps"] + 1)

    st = jax.lax.while_loop(cond, body, state)
    return Hit(t=st["t"], tri=st["tri"], u=st["u"], v=st["v"])


def trace_closest(bvh, tris, org, d, t_min=1e-4, t_max=INF, max_steps=None) -> Hit:
    """Closest-hit trace. `tris` = (v0, e1, e2) world-space SoA from
    `GpuScene.triangle_corners`. org/d: (R, 3)."""
    return _traverse(bvh, tris, org, d, jnp.float32(t_min), t_max, False, max_steps)


def trace_shadow(bvh, tris, org, d, t_min=1e-4, t_max=INF, max_steps=None):
    """Any-hit occlusion trace -> (R,) bool `occluded` (~ rt_is_shadowed)."""
    hit = _traverse(bvh, tris, org, d, jnp.float32(t_min), t_max, True, max_steps)
    return hit.hit_mask


# ----------------------------------------------------------------------------
# Scene-level dispatch: Pallas brute-force intersector on TPU (ops/
# woop_pallas.py — tri tests stay in VMEM/registers, no HBM intermediates),
# XLA brute-force elsewhere (CPU tests / culled large scenes), skip-link BVH
# traversal beyond the brute-force range. All renderer passes go through
# these two functions — they are the software `TraceRay`.
# ----------------------------------------------------------------------------

def _use_pallas(ts) -> bool:
    """Pallas iff the scene's arrays live on (or the jit targets) TPU.

    Derived from the woop table's actual placement, not global device order:
    scene build runs eagerly on the CPU backend (`world.py::build_trace_scene`)
    while the frame jit targets the accelerator, so `jax.devices()[0]` says
    nothing about where *these* arrays are. Inside jit the arrays are tracers
    with no committed device — there the jit's backend (default) decides.

    KAJIYA_NO_PALLAS_TRACE=1 forces the XLA path — the escape hatch for
    libtpu builds whose Mosaic pipeline rejects the streaming kernels
    (bench falls back to it rather than losing the datum)."""
    import os

    if os.environ.get("KAJIYA_NO_PALLAS_TRACE"):
        return False
    arr = ts.woop["a_d"] if isinstance(ts.woop, dict) else None
    devices = getattr(arr, "devices", None)
    if callable(devices):
        try:
            return all(d.platform == "tpu" for d in devices())
        except Exception:
            pass  # tracer under jit: fall through to the jit's backend
    return jax.default_backend() == "tpu"


def _can_sort(ts, sort: bool) -> bool:
    """Wavefront sorting only pays where the culled tracer runs (scenes
    with cluster tables); small brute scenes would pay the sort for
    nothing. Callers mark divergent batches (GI/bounce/validation rays)
    with sort=True; coherent screen-order batches leave it False."""
    return (sort and isinstance(ts.woop, dict)
            and ts.woop.get("cmin64") is not None)


def scene_trace_closest(ts, org, d, t_min=1e-4, t_max=INF, max_steps=None,
                        sort: bool = False, rb=None) -> Hit:
    """Closest-hit against a TraceScene (~ `GbufferRaytrace::trace`).
    `rb` overrides the culled kernel's rays-per-chunk; sorted wavefronts
    default to the fine SORT_RAY_BLOCK (divergent chunks cull tighter)."""
    if _can_sort(ts, sort):
        from ..ops.raysort import SORT_RAY_BLOCK, sorted_trace

        crb = SORT_RAY_BLOCK if rb is None else rb

        def fn(o, dd, tm):
            h = scene_trace_closest(ts, o, dd, t_min=t_min, t_max=tm,
                                    max_steps=max_steps, rb=crb)
            return h.t, h.tri, h.u, h.v

        t, tri, u, v = sorted_trace(fn, ts.woop, org, d, t_max=t_max)
        return Hit(t=t, tri=tri, u=u, v=v)
    if ts.woop is not None:
        if _use_pallas(ts):
            from ..ops.woop_pallas import intersect_scene_pallas

            t, tri, u, v = intersect_scene_pallas(ts.woop, org, d,
                                                  t_min=t_min, t_max=t_max,
                                                  rb=rb)
            return Hit(t=t, tri=tri, u=u, v=v)
        from ..ops.woop import CULLED_RAY_BLOCK, intersect_brute

        brb = CULLED_RAY_BLOCK if "cmin" in ts.woop else None
        t, tri, u, v = intersect_brute(ts.woop, org, d, t_min=t_min,
                                       t_max=t_max,
                                       **({"ray_block": brb} if brb
                                          else {}))
        return Hit(t=t, tri=tri, u=u, v=v)
    return trace_closest(ts.bvh, ts.tris, org, d, t_min, t_max, max_steps)


def scene_trace_shadow(ts, org, d, t_min=1e-4, t_max=INF, max_steps=None,
                       sort: bool = False, rb=None):
    """Occlusion against a TraceScene -> (R,) bool (~ `rt_is_shadowed`)."""
    if _can_sort(ts, sort):
        from ..ops.raysort import SORT_RAY_BLOCK, sorted_trace

        crb = SORT_RAY_BLOCK if rb is None else rb

        def fn(o, dd, tm):
            return (scene_trace_shadow(ts, o, dd, t_min=t_min, t_max=tm,
                                       max_steps=max_steps, rb=crb),)

        (occ,) = sorted_trace(fn, ts.woop, org, d, t_max=t_max)
        return occ
    if ts.woop is not None:
        if _use_pallas(ts):
            from ..ops.woop_pallas import intersect_scene_pallas

            _t, tri, _u, _v = intersect_scene_pallas(
                ts.woop, org, d, t_min=t_min, t_max=t_max, any_hit=True,
                rb=rb)
            return tri >= 0
        from ..ops.woop import CULLED_RAY_BLOCK, intersect_brute

        brb = CULLED_RAY_BLOCK if "cmin" in ts.woop else None
        t, tri, _u, _v = intersect_brute(ts.woop, org, d, t_min=t_min,
                                         t_max=t_max, any_hit=True,
                                         **({"ray_block": brb} if brb
                                            else {}))
        return tri >= 0
    return trace_shadow(ts.bvh, ts.tris, org, d, t_min, t_max, max_steps)
