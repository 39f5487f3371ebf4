"""BVH build (host) + per-frame refit (jitted) — the software replacement for
hardware acceleration structures.

The reference builds one BLAS per mesh from device addresses and rebuilds a
TLAS every frame on the GPU (`vulkan/ray_tracing.rs:96-275,455+`,
`world_renderer.rs:865-911`). TPU has no RT hardware, so here:

  * topology is built ONCE on host over Morton-sorted triangles (median
    splits over the sorted order == an LBVH-quality tree), flattened into a
    skip-link ("threaded") layout so traversal needs NO per-ray stack — the
    per-ray state is a single node index, which keeps the lockstep
    `lax.while_loop` traversal state tiny and VPU-friendly;
  * bounds are REFIT inside the jitted frame from current world-space
    vertices (the analog of the per-frame TLAS rebuild), so animated
    instance transforms need no host round-trip.

Skip-link layout: nodes in DFS order. For node i, `first_child == i + 1`; the
`skip` pointer jumps over i's whole subtree. Traversal: box hit & internal ->
descend to i+1; otherwise -> skip[i]. Leaves store `leaf_size`-aligned runs of
reordered triangle ids.
"""
from __future__ import annotations

import sys
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _expand_bits(v):
    """Spread lower 10 bits of v to every 3rd bit (for 30-bit Morton codes)."""
    v = (v * 0x00010001) & 0xFF0000FF
    v = (v * 0x00000101) & 0x0F00F00F
    v = (v * 0x00000011) & 0xC30C30C3
    v = (v * 0x00000005) & 0x49249249
    return v


def morton3d(xyz01: np.ndarray) -> np.ndarray:
    """(N,3) floats in [0,1] -> 30-bit Morton codes (uint32)."""
    q = np.clip(xyz01 * 1024.0, 0, 1023).astype(np.uint64)
    return (_expand_bits(q[:, 0]) << 2) | (_expand_bits(q[:, 1]) << 1) | _expand_bits(q[:, 2])


@jax.tree_util.register_pytree_node_class
@dataclass
class Bvh:
    """Flattened skip-link BVH. All arrays device-resident.

    node_min/node_max : (N, 3) f32  AABB (refittable)
    node_first        : (N,) i32    leaf: offset into tri_order; internal: unused
    node_count        : (N,) i32    leaf: #tris (1..leaf_size); internal: 0
    node_skip         : (N,) i32    next DFS node when subtree is skipped (N = done)
    tri_order         : (P,) i32    reordered triangle ids, padded with -1 to a
                                    multiple of leaf_size
    """

    node_min: Any
    node_max: Any
    node_first: Any
    node_count: Any
    node_skip: Any
    tri_order: Any
    leaf_size: int = 4

    def tree_flatten(self):
        return (
            (self.node_min, self.node_max, self.node_first, self.node_count,
             self.node_skip, self.tri_order),
            self.leaf_size,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, leaf_size=aux)

    @property
    def num_nodes(self):
        return self.node_min.shape[0]


def build_bvh(tri_min: np.ndarray, tri_max: np.ndarray, leaf_size: int = 4):
    """Build topology on host. Returns (Bvh with numpy arrays, levels) where
    `levels` is the bottom-up refit schedule: list of (node_ids, child0, child1)
    per depth, deepest first (leaves excluded — their bounds come from tris)."""
    n_tris = tri_min.shape[0]
    centers = 0.5 * (tri_min + tri_max)
    lo, hi = centers.min(axis=0), centers.max(axis=0)
    norm = (centers - lo) / np.maximum(hi - lo, 1e-12)
    order = np.argsort(morton3d(norm), kind="stable").astype(np.int32)

    # Emit nodes in DFS order. Recursion depth is O(log n) (median splits).
    node_min, node_max = [], []
    node_first, node_count, node_skip, node_depth = [], [], [], []
    tri_runs = []  # list of (start_in_order, count) per leaf, in emission order

    sys.setrecursionlimit(10000)

    omin = tri_min[order]
    omax = tri_max[order]
    # Prefix bounds would not help (arbitrary ranges) — compute unions on the fly.

    def rec(s, e, depth):
        i = len(node_min)
        node_min.append(None)
        node_max.append(None)
        node_first.append(0)
        node_count.append(0)
        node_skip.append(0)
        node_depth.append(depth)
        if e - s <= leaf_size:
            node_first[i] = len(tri_runs) * leaf_size
            node_count[i] = e - s
            tri_runs.append((s, e - s))
            node_min[i] = omin[s:e].min(axis=0)
            node_max[i] = omax[s:e].max(axis=0)
        else:
            mid = (s + e) // 2
            rec(s, mid, depth + 1)
            rec(mid, e, depth + 1)
            node_min[i] = np.minimum(node_min[i + 1], node_min[node_skip[i + 1]])
            node_max[i] = np.maximum(node_max[i + 1], node_max[node_skip[i + 1]])
        node_skip[i] = len(node_min)

    rec(0, n_tris, 0)
    n_nodes = len(node_min)

    # Padded, leaf_size-aligned triangle order
    tri_order = np.full(len(tri_runs) * leaf_size, -1, np.int32)
    for li, (s, cnt) in enumerate(tri_runs):
        tri_order[li * leaf_size: li * leaf_size + cnt] = order[s: s + cnt]

    node_first = np.asarray(node_first, np.int32)
    node_count = np.asarray(node_count, np.int32)
    node_skip = np.asarray(node_skip, np.int32)
    node_depth = np.asarray(node_depth, np.int32)
    node_min = np.stack(node_min).astype(np.float32)
    node_max = np.stack(node_max).astype(np.float32)

    # Refit schedule: internal nodes grouped by depth, deepest first.
    internal = np.nonzero(node_count == 0)[0].astype(np.int32)
    levels = []
    if len(internal):
        ids_all = internal
        child0 = ids_all + 1
        child1 = node_skip[child0]
        depths = node_depth[ids_all]
        for d in range(depths.max(), -1, -1):
            sel = depths == d
            if sel.any():
                levels.append((ids_all[sel], child0[sel], child1[sel]))

    bvh = Bvh(
        node_min=node_min, node_max=node_max, node_first=node_first,
        node_count=node_count, node_skip=node_skip, tri_order=tri_order,
        leaf_size=leaf_size,
    )
    return bvh, levels


def build_bvh_native(tri_min: np.ndarray, tri_max: np.ndarray,
                     leaf_size: int = 4):
    """C++ builder (native/bvh_builder.cpp) producing bit-identical output to
    `build_bvh` (same morton + median-split algorithm) at C++ speed for
    production-size meshes. Returns (Bvh numpy, levels) or raises if the
    toolchain is unavailable."""
    import ctypes

    from ..native import load

    lib = load("bvh_builder")
    n = tri_min.shape[0]
    cap_nodes = 2 * n + 2
    cap_order = 2 * n + leaf_size
    node_min = np.empty((cap_nodes, 3), np.float32)
    node_max = np.empty((cap_nodes, 3), np.float32)
    node_first = np.empty(cap_nodes, np.int32)
    node_count = np.empty(cap_nodes, np.int32)
    node_skip = np.empty(cap_nodes, np.int32)
    node_depth = np.empty(cap_nodes, np.int32)
    tri_order = np.empty(cap_order, np.int32)
    n_nodes = ctypes.c_int()
    n_order = ctypes.c_int()

    tmin = np.ascontiguousarray(tri_min, np.float32)
    tmax = np.ascontiguousarray(tri_max, np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    rc = lib.build_bvh(
        tmin.ctypes.data_as(f32p), tmax.ctypes.data_as(f32p),
        ctypes.c_int(n), ctypes.c_int(leaf_size),
        node_min.ctypes.data_as(f32p), node_max.ctypes.data_as(f32p),
        node_first.ctypes.data_as(i32p), node_count.ctypes.data_as(i32p),
        node_skip.ctypes.data_as(i32p), node_depth.ctypes.data_as(i32p),
        tri_order.ctypes.data_as(i32p),
        ctypes.byref(n_nodes), ctypes.byref(n_order))
    if rc != 0:
        raise RuntimeError(f"native bvh build failed rc={rc}")
    nn, no = n_nodes.value, n_order.value
    node_min, node_max = node_min[:nn], node_max[:nn]
    node_first, node_count = node_first[:nn], node_count[:nn]
    node_skip, node_depth = node_skip[:nn], node_depth[:nn]
    tri_order = tri_order[:no]

    internal = np.nonzero(node_count == 0)[0].astype(np.int32)
    levels = []
    if len(internal):
        child0 = internal + 1
        child1 = node_skip[child0]
        depths = node_depth[internal]
        for d in range(depths.max(), -1, -1):
            sel = depths == d
            if sel.any():
                levels.append((internal[sel], child0[sel], child1[sel]))

    bvh = Bvh(node_min=node_min, node_max=node_max, node_first=node_first,
              node_count=node_count, node_skip=node_skip,
              tri_order=tri_order, leaf_size=leaf_size)
    return bvh, levels


# meshes above this size go through the native builder (python recursion is
# the reference implementation + fallback)
NATIVE_BUILD_MIN_TRIS = 20_000


def refit_bvh(bvh: Bvh, levels, v0, e1, e2) -> Bvh:
    """Refit node bounds from current triangle geometry (traced, runs in-jit).

    `levels` is the host-side schedule from `build_bvh` (static). The analog of
    the reference's per-frame GPU TLAS rebuild (`ray_tracing.rs:455+`)."""
    t = bvh.tri_order
    safe = jnp.maximum(t, 0)
    p0 = v0[safe]
    p1 = p0 + e1[safe]
    p2 = p0 + e2[safe]
    big = jnp.float32(3e37)
    dead = (t < 0)[:, None]
    tmin = jnp.where(dead, big, jnp.minimum(jnp.minimum(p0, p1), p2))
    tmax = jnp.where(dead, -big, jnp.maximum(jnp.maximum(p0, p1), p2))
    # leaf bounds: reduce each aligned run of leaf_size
    L = bvh.leaf_size
    runs_min = tmin.reshape(-1, L, 3).min(axis=1)   # (num_runs, 3)
    runs_max = tmax.reshape(-1, L, 3).max(axis=1)

    node_min, node_max = bvh.node_min, bvh.node_max
    is_leaf = bvh.node_count > 0
    run_idx = bvh.node_first // L
    node_min = jnp.where(is_leaf[:, None], runs_min[run_idx], node_min)
    node_max = jnp.where(is_leaf[:, None], runs_max[run_idx], node_max)

    for ids, c0, c1 in levels:
        ids_j, c0_j, c1_j = jnp.asarray(ids), jnp.asarray(c0), jnp.asarray(c1)
        new_min = jnp.minimum(node_min[c0_j], node_min[c1_j])
        new_max = jnp.maximum(node_max[c0_j], node_max[c1_j])
        node_min = node_min.at[ids_j].set(new_min)
        node_max = node_max.at[ids_j].set(new_max)

    return Bvh(node_min=node_min, node_max=node_max, node_first=bvh.node_first,
               node_count=bvh.node_count, node_skip=bvh.node_skip,
               tri_order=bvh.tri_order, leaf_size=bvh.leaf_size)


def bvh_from_scene(gpu_scene, leaf_size: int = 4):
    """Build BVH over a GpuScene's current world-space triangles.
    Returns (bvh (device), levels, (v0, e1, e2) world triangle SoA).
    Large meshes use the native C++ builder when the toolchain allows."""
    from .._compat import default_cpu_if_eager

    with default_cpu_if_eager():
        v0, e1, e2 = gpu_scene.triangle_corners()
        v0n, e1n, e2n = np.asarray(v0), np.asarray(e1), np.asarray(e2)
    p1, p2 = v0n + e1n, v0n + e2n
    tmin = np.minimum(np.minimum(v0n, p1), p2)
    tmax = np.maximum(np.maximum(v0n, p1), p2)
    if tmin.shape[0] >= NATIVE_BUILD_MIN_TRIS:
        try:
            bvh, levels = build_bvh_native(tmin, tmax, leaf_size=leaf_size)
        except Exception:
            bvh, levels = build_bvh(tmin, tmax, leaf_size=leaf_size)
    else:
        bvh, levels = build_bvh(tmin, tmax, leaf_size=leaf_size)
    with default_cpu_if_eager():
        bvh = jax.tree_util.tree_map(jnp.asarray, bvh)
    return bvh, levels, (v0, e1, e2)
