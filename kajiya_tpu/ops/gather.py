"""Fast row gathers: one-hot MXU matmuls for small tables.

XLA's native gather on TPU walks elements at HBM-latency (~ns/element); for
the renderer's attribute fetches (vertices, normals, uvs, materials of a
trace batch) the tables are small, so gathering as
    onehot(idx, V) @ table        -- (R, V) @ (V, C)
turns a latency-bound loop into MXU work. Blocked over rays so the one-hot
never materializes beyond a (B, V) tile. Falls back to plain indexing for
large tables.

This is the same trick the Woop intersector plays for intersection: recast
irregular access as dense matmul, which is the TPU's native tongue.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

ONEHOT_MAX_ROWS = 2048      # above this, one-hot matmuls lose to HBM gather
RAY_BLOCK = 32768

# escape hatch while chasing TPU-compiler interactions
_DISABLE = os.environ.get("KAJIYA_TPU_DISABLE_ONEHOT_GATHER") == "1"

# One-hot matmul gathers were round 1's workaround for "slow gathers"; the
# real culprit turned out to be tiny-N dots elsewhere wedging the runtime
# (ops/smallvec.py), and the one-hot dots THEMSELVES lower to tiny-N
# convolutions. Plain gathers run at HBM bandwidth — default to them.
_USE_ONEHOT = os.environ.get("KAJIYA_TPU_ONEHOT_GATHER") == "1"


def take_rows(table, idx):
    """Row gather `table[idx]` (in-bounds promised).

    Plain XLA gathers on this TPU run at HBM bandwidth — the ~20 ms "slow
    gathers" chased in round 2 turned out to be collateral damage of
    pathological tiny-N dots elsewhere in the program wedging the runtime
    into a degraded dispatch mode (see ops/smallvec.py). With those gone,
    nothing special is needed here."""
    return table.at[idx].get(mode="promise_in_bounds")


# Lane-major fetch: tables at or below this many rows ride a fused one-hot
# MXU matmul (measured on v5e: 2M-ray fetch from a 64-row table = 1.2 ms vs
# 7.6 ms for the padded wide gather; crossover vs the 6.4 ms gather is
# ~1.5k rows — tools/micro_gather_layout.py / micro_onehot_thresh.py).
ONEHOT_T_MAX = 1024


def fetch_rows_t(table, idx):
    """table: (T, C) f32, idx: (R,) int32 in-bounds -> (C, R) LANE-MAJOR.

    The padded row-major gather result (R, C){1,0} tiles C up to 128 lanes
    (a 30-wide fetch at 1080p occupies 1.06 GB and every consumer fusion
    re-reads it); the lane-major form is dense. Small tables skip the
    serial gather entirely: out = table^T @ onehot(idx) on the MXU with
    HIGHEST precision (exact f32 selection via the 6-pass emulation — the
    one-hot construction fuses into the dot, nothing (T, R) materializes).
    """
    t = table.shape[0]
    if t <= ONEHOT_T_MAX:
        one = (jax.lax.broadcasted_iota(jnp.int32, (t, idx.shape[0]), 0)
               == idx[None, :]).astype(jnp.float32)
        return jax.lax.dot_general(
            table, one, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
    return table.at[idx].get(mode="promise_in_bounds").T


def interp3_rows_t(table, i0, i1, i2, w0, w1, w2):
    """Barycentric-weighted 3-row fetch, lane-major:
    out[:, r] = w0[r]*table[i0[r]] + w1[r]*table[i1[r]] + w2[r]*table[i2[r]]

    Small tables fuse gather AND interpolation into ONE matmul against a
    three-hot weight matrix (the vertex-attribute analog of the Pallas
    two-hot warp kernel); duplicate indices accumulate, which is exactly
    the right semantics. Returns (C, R)."""
    t = table.shape[0]
    r = i0.shape[0]
    if t <= ONEHOT_T_MAX:
        iota = jax.lax.broadcasted_iota(jnp.int32, (t, r), 0)
        m = (jnp.where(iota == i0[None, :], w0[None, :], 0.0)
             + jnp.where(iota == i1[None, :], w1[None, :], 0.0)
             + jnp.where(iota == i2[None, :], w2[None, :], 0.0))
        return jax.lax.dot_general(
            table, m, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
    va0 = table.at[i0].get(mode="promise_in_bounds")
    va1 = table.at[i1].get(mode="promise_in_bounds")
    va2 = table.at[i2].get(mode="promise_in_bounds")
    return (va0 * w0[:, None] + va1 * w1[:, None] + va2 * w2[:, None]).T


def gather_rows(table, idx):
    """table: (V, C) or (V,) float/int; idx: (R,) int32 (assumed in-bounds).
    Returns table[idx] computed the fast way for the table size. Integer
    tables ride the same path via exact f32 matmul (values < 2^24)."""
    v = table.shape[0]
    if _DISABLE or not _USE_ONEHOT or v > ONEHOT_MAX_ROWS:
        return take_rows(table, idx)
    as_int = table.dtype.kind in "iu"
    if not as_int and table.dtype.kind != "f":
        return take_rows(table, idx)
    squeeze = table.ndim == 1
    tab = table[:, None] if squeeze else table
    if as_int:
        tab = tab.astype(jnp.float32)
    r = idx.shape[0]
    pad = (-r) % RAY_BLOCK
    idx_p = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)]) if pad else idx
    nb = idx_p.shape[0] // RAY_BLOCK

    def chunk(carry, ib):
        from .smallvec import dot_pad_n

        one = jax.nn.one_hot(ib, v, dtype=tab.dtype)          # (B, V)
        out = dot_pad_n(one, tab)     # N padded: tiny-N dots are pathological
        return carry, out

    _, out = jax.lax.scan(chunk, 0, idx_p.reshape(nb, RAY_BLOCK))
    out = out.reshape(-1, tab.shape[1])[:r]
    if as_int:
        out = jnp.round(out).astype(table.dtype)
    else:
        out = out.astype(table.dtype)
    return out[:, 0] if squeeze else out


def gather_rows_multi(tables, idx):
    """Gather SEVERAL same-length tables with one shared index stream in a
    single blocked one-hot matmul (columns concatenated). Returns a list in
    input order; int tables round-trip exactly (values < 2^24)."""
    cols = []
    metas = []
    for t in tables:
        squeeze = t.ndim == 1
        tt = t[:, None] if squeeze else t
        metas.append((squeeze, t.dtype, tt.shape[1]))
        cols.append(tt.astype(jnp.float32))
    big = jnp.concatenate(cols, axis=-1)
    out = gather_rows(big, idx)
    res = []
    off = 0
    for squeeze, dt, w in metas:
        sl = out[:, off:off + w]
        if dt.kind in "iu":
            sl = jnp.round(sl).astype(dt)
        else:
            sl = sl.astype(dt)
        res.append(sl[:, 0] if squeeze else sl)
        off += w
    return res
