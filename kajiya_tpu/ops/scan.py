"""Prefix scans and stream compaction.

Role of the reference's 3-dispatch GPU prefix scan over 1M u32
(`renderers/prefix_scan.rs:10-39`, `assets/shaders/prefix_scan/*`) used for
ircache entry compaction. On TPU the hierarchical scan is simply
`jnp.cumsum` (XLA lowers to a work-efficient scan); `compact_indices` is the
compaction idiom built on it, shared by ircache allocation and any
fixed-capacity pool.
"""
from __future__ import annotations

import jax.numpy as jnp


def inclusive_scan(x, axis: int = -1):
    """Inclusive prefix sum (the reference's scan contract)."""
    return jnp.cumsum(x, axis=axis)


def exclusive_scan(x, axis: int = -1):
    return jnp.cumsum(x, axis=axis) - x


def compact_indices(mask, capacity: int | None = None):
    """Indices of True lanes, densely packed into a fixed-size buffer.

    Returns (packed (capacity,) int32 with -1 padding, count ()). The
    scatter uses unique ranks so it is deterministic — the TPU equivalent of
    `ircache_compact_entries.hlsl`."""
    n = mask.shape[0]
    if capacity is None:
        capacity = n
    rank = exclusive_scan(mask.astype(jnp.int32))
    count = jnp.sum(mask.astype(jnp.int32))
    ids = jnp.arange(n, dtype=jnp.int32)
    ok = mask & (rank < capacity)
    packed = jnp.full((capacity,), -1, jnp.int32)
    packed = packed.at[jnp.where(ok, rank, 0)].max(
        jnp.where(ok, ids, -1), mode="promise_in_bounds")
    return packed, jnp.minimum(count, capacity)
