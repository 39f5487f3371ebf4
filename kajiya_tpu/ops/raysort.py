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
    """(R,) u32 sort key, mixed-radix: origin-morton HIGH bits | direction
    cell | origin-morton LOW bits | direction low bits.

    Why mixed and not origin-major: a chunk boundary falls wherever the top
    log2(R/chunk) key bits change, so whatever sits in the LOW bits is
    unconstrained within a chunk. With origin-major keys a 512-ray chunk of
    a 1M-ray GI wavefront shares ~17 adjacent origin cells but spans ALL
    directions — its bounding beam is an omnidirectional sphere and the
    culler visits ~every in-range block (measured 580/596 on the diorama,
    tools/dbg_cull_stats.py). Placing the direction cell ABOVE the origin's
    fine bits bounds chunks in position AND direction, which is exactly
    what the directional-AABB reach test in woop_pallas._active_blocks
    needs to cull."""
    ext = jnp.maximum(smax - smin, 1e-6)
    oq = jnp.clip(((org - smin) / ext) * (1 << obits), 0.0,
                  float((1 << obits) - 1)).astype(jnp.uint32)
    dq = jnp.clip((d * 0.5 + 0.5) * (1 << dbits), 0.0,
                  float((1 << dbits) - 1)).astype(jnp.uint32)
    o_lo_b = min(2, obits)           # fine origin bits demoted below dir
    d_lo_b = min(1, dbits)           # finest dir bit below those
    o_hi = _interleave3(oq[:, 0] >> o_lo_b, oq[:, 1] >> o_lo_b,
                        oq[:, 2] >> o_lo_b, obits - o_lo_b)
    d_hi = _interleave3(dq[:, 0] >> d_lo_b, dq[:, 1] >> d_lo_b,
                        dq[:, 2] >> d_lo_b, dbits - d_lo_b)
    lo_mask = jnp.uint32((1 << o_lo_b) - 1)
    o_lo = _interleave3(oq[:, 0] & lo_mask, oq[:, 1] & lo_mask,
                        oq[:, 2] & lo_mask, o_lo_b)
    dlo_mask = jnp.uint32((1 << d_lo_b) - 1)
    d_lo = _interleave3(dq[:, 0] & dlo_mask, dq[:, 1] & dlo_mask,
                        dq[:, 2] & dlo_mask, d_lo_b)
    key = o_hi
    for part, bits in ((d_hi, 3 * (dbits - d_lo_b)), (o_lo, 3 * o_lo_b),
                       (d_lo, 3 * d_lo_b)):
        key = (key << bits) | part
    return key


# Sorted-wavefront defaults, chosen by the diorama sweep
# (tools/dbg_cull_stats2.py): coarse mixed key bits bound every 512-ray
# bucket in BOTH position and direction at realistic wavefront sizes, and
# fine 128-ray chunks cull ~1.6x tighter than 512 (GI mean visits 117 vs
# 183; shadow 27 vs 44) for ~33 us/Mray of extra per-chunk overhead.
SORT_OBITS = 3
SORT_DBITS = 2
SORT_RAY_BLOCK = 128


def sorted_trace(trace_fn, woop, org, d, t_max=None, obits: int = SORT_OBITS,
                 dbits: int = SORT_DBITS):
    """Run `trace_fn(org, d, t_max) -> tuple of (R,) arrays` on a
    key-sorted permutation of the rays and scatter the results back.

    The permutation rides `lax.sort` as a payload column; ray rows are
    packed (org|d|tmax) so the shuffle is ONE wide gather each way
    (narrow per-array gathers serialize at ~6.6 ns/row, docs §round-4)."""
    r = org.shape[0]
    smin = jnp.min(woop["cmin64"], axis=0)
    smax = jnp.max(woop["cmax64"], axis=0)
    key = ray_sort_key(org, d, smin, smax, obits, dbits)
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
