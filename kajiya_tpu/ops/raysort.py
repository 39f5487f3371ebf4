"""Direction+origin sorted ray wavefronts for the culled streaming tracer.

The cluster-culled intersector (ops/woop_pallas.py) prices a ray CHUNK by
how many 128-tri blocks its bounding beam touches. Camera rays arrive
screen-coherent, so chunks form tight cones and cull well; bounce/GI rays
arrive in SCREEN order with hemisphere-random directions, so every chunk is
divergent (`_chunk_beams` coherent=False), falls back to the origin-sphere
test, and visits nearly every in-range block.

This module restores coherence the wavefront way (the TPU analog of the
ray-reordering in wavefront path tracers): sort the whole ray batch by a
spatial-directional key, trace the sorted batch, scatter results back.
Chunks of the sorted batch share an origin cell AND a direction cell, so
`_chunk_beams` sees genuine cones again. Sorting is data movement the TPU
is good at (one `lax.sort` of a packed key + two wide-row gathers — see
ops/gather.py for why wide rows are the cheap layout), while the visits it
saves are serial VPU block work at ~2.4 us each (tools/culled_cost_model.py).

Reference analog: hardware RT cores hide incoherence in fixed-function
traversal (`vulkan/ray_tracing.rs`); a software TPU tracer must instead
shape the wavefront. No reference code corresponds to this module.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# origin: 5 bits/axis morton (32^3 scene cells); direction: 3 bits/axis.
# 24-bit keys; a 512-ray chunk of the sorted batch then spans ADJACENT
# buckets (morton order keeps them spatially close), which is exactly the
# locality the beam test needs. Finer origin cells shrink each chunk's
# bounding sphere toward the 128-tri block radius — for same-direction
# (sun shadow) chunks the visited corridor is a cylinder of radius
# ro+rbnd, so origin bits translate directly into fewer visits
# (tools/dbg_cull_stats.py sweeps this).
_OBITS = 5
_DBITS = 3


def _interleave3(x, y, z, bits):
    """Morton-interleave three `bits`-wide ints (vectorized, u32)."""
    out = jnp.zeros_like(x)
    for b in range(bits):
        out = out | (((x >> b) & 1) << (3 * b + 2))
        out = out | (((y >> b) & 1) << (3 * b + 1))
        out = out | (((z >> b) & 1) << (3 * b))
    return out


def ray_sort_key(org, d, smin, smax, obits: int = _OBITS,
                 dbits: int = _DBITS):
    """(R,) u32 sort key: origin morton cell (major) | direction cell."""
    ext = jnp.maximum(smax - smin, 1e-6)
    oq = jnp.clip(((org - smin) / ext) * (1 << obits), 0.0,
                  float((1 << obits) - 1)).astype(jnp.uint32)
    okey = _interleave3(oq[:, 0], oq[:, 1], oq[:, 2], obits)
    dq = jnp.clip((d * 0.5 + 0.5) * (1 << dbits), 0.0,
                  float((1 << dbits) - 1)).astype(jnp.uint32)
    dkey = _interleave3(dq[:, 0], dq[:, 1], dq[:, 2], dbits)
    return (okey << (3 * dbits)) | dkey


def sorted_trace(trace_fn, woop, org, d, t_max=None):
    """Run `trace_fn(org, d, t_max) -> tuple of (R,) arrays` on a
    key-sorted permutation of the rays and scatter the results back.

    The permutation rides `lax.sort` as a payload column; ray rows are
    packed (org|d|tmax) so the shuffle is ONE wide gather each way
    (narrow per-array gathers serialize at ~6.6 ns/row, docs §round-4)."""
    r = org.shape[0]
    smin = jnp.min(woop["cmin64"], axis=0)
    smax = jnp.max(woop["cmax64"], axis=0)
    key = ray_sort_key(org, d, smin, smax)
    iota = jax.lax.iota(jnp.int32, r)
    _, perm = jax.lax.sort((key, iota), num_keys=1)

    if t_max is None:
        packed = jnp.concatenate([org, d], axis=-1)           # (R, 6)
    else:
        packed = jnp.concatenate(
            [org, d, jnp.broadcast_to(
                jnp.asarray(t_max, jnp.float32), (r,))[:, None]], axis=-1)
    ps = packed[perm]
    tm = ps[:, 6] if t_max is not None else None
    outs = trace_fn(ps[:, 0:3], ps[:, 3:6], tm)

    inv = jnp.zeros((r,), jnp.int32).at[perm].set(iota)
    # Pack every output as a 32-bit column of ONE wide row. Integer/bool
    # payloads (tri ids, hit masks) are BITCAST — not value-cast — so they
    # survive the gather exactly at any magnitude (a value round-trip
    # through f32 corrupts ints >= 2^24).
    cols = []
    for o in outs:
        if jnp.issubdtype(o.dtype, jnp.floating):
            cols.append(o.astype(jnp.float32))
        else:
            cols.append(jax.lax.bitcast_convert_type(
                o.astype(jnp.int32), jnp.float32))
    po = jnp.stack(cols, axis=-1)[inv]
    res = []
    for i, o in enumerate(outs):
        c = po[:, i]
        if jnp.issubdtype(o.dtype, jnp.floating):
            res.append(c.astype(o.dtype))
        else:
            res.append(jax.lax.bitcast_convert_type(
                c, jnp.int32).astype(o.dtype))
    return tuple(res)
