"""Safe small-vector linear algebra for big batches.

On this TPU stack, XLA lowers a contraction of a big batch against a SMALL
shared operand (matvec / matmul with tiny N and K — e.g.
`einsum("ij,rj->ri")` with a 3x4 camera matrix, `(x*w).sum(-1)` luminance,
`(R,9)@(9,3)` SH evaluation) to a pathological MXU program: ~25 ms for 2M
rows where the arithmetic is worth ~0.03 ms, and afterwards the runtime
stays wedged in a degraded dispatch mode (~92 ms floor for every subsequent
program, measured; the 4x4 variant hangs outright). Batched per-element
contractions (`einsum("rij,rj->ri")`, `einsum("...i,...i->...")`) are fine.

Everything here unrolls the small dimension into explicit slice-multiply-add
chains — pure VPU work that XLA never converts back into a dot (the shapes
no longer match a dot_general).

Use these instead of einsum/@ whenever one operand is a small shared
matrix/vector.
"""
from __future__ import annotations

import jax.numpy as jnp


def dot3(a, b):
    """Elementwise 3-vector dot over the last axis, written so XLA can never
    rewrite it into a tiny-N dot (safe for ANY broadcast combination,
    including one operand being a shared (3,) vector — the poison case)."""
    return (a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]
            + a[..., 2] * b[..., 2])


def norm3(a):
    """|a| over a trailing 3-axis without a minor-dim reduce (XLA's reduce
    over a 3-wide minor runs at ~3 ns/elem — gather-class cost; explicit
    lane slices + adds are bandwidth-bound)."""
    return jnp.sqrt(jnp.maximum(dot3(a, a), 1e-24))


def normalize3(a, eps: float = 1e-8):
    """a / max(|a|, eps) for (..., 3), reduce-free."""
    inv = 1.0 / jnp.maximum(norm3(a), eps)
    return a * inv[..., None]


def weighted_sum(x, w):
    """sum_k x[..., k] * w[k] for a small constant/shared vector w.
    The safe form of `einsum("...k,k->...", x, w)`."""
    n = x.shape[-1]
    acc = x[..., 0] * w[0]
    for k in range(1, n):
        acc = acc + x[..., k] * w[k]
    return acc


def matvec(m, v):
    """m: (I, K) small shared matrix; v: (..., K) big batch.
    Returns (..., I) = `einsum("ik,...k->...i", m, v)` the safe way."""
    i, k = m.shape
    cols = []
    for ii in range(i):
        acc = v[..., 0] * m[ii, 0]
        for kk in range(1, k):
            acc = acc + v[..., kk] * m[ii, kk]
        cols.append(acc)
    return jnp.stack(cols, axis=-1)


def transform_points(m, p):
    """Affine transform: m (3, 4) or (4, 4) row-major; p (..., 3).
    Returns (..., 3) = R p + t."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    out = [m[i, 0] * x + m[i, 1] * y + m[i, 2] * z + m[i, 3] for i in range(3)]
    return jnp.stack(out, axis=-1)


def transform_dirs(m, v):
    """Linear transform: m (3, 3)-or-wider row-major; v (..., 3) -> (..., 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    out = [m[i, 0] * x + m[i, 1] * y + m[i, 2] * z for i in range(3)]
    return jnp.stack(out, axis=-1)


def transform_h(m, p):
    """Full homogeneous transform: m (4, 4); p (..., 4) -> (..., 4)."""
    cols = []
    for i in range(4):
        acc = p[..., 0] * m[i, 0]
        for k in range(1, 4):
            acc = acc + p[..., k] * m[i, k]
        cols.append(acc)
    return jnp.stack(cols, axis=-1)


def dot_pad_n(a, b, n_pad: int = 128):
    """a @ b where b: (K, N) with N tiny but K large (so unrolling is out).
    Pads N up to a full lane tile so XLA emits a healthy matmul instead of
    the pathological tiny-N dot, then slices the result."""
    import jax

    n = b.shape[-1]
    if n >= n_pad:
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    # barrier the zero pad: XLA's simplifier otherwise strips provably-zero
    # columns and regenerates the pathological tiny-N dot
    z = jax.lax.optimization_barrier(
        jnp.zeros(b.shape[:-1] + (n_pad - n,), b.dtype))
    bp = jnp.concatenate([b, z], axis=-1)
    return jnp.dot(a, bp, preferred_element_type=jnp.float32)[..., :n]


def matmul_small(a, b):
    """a: (..., K) big batch; b: (K, N) small shared matrix, K and N small.
    Returns (..., N) = a @ b without forming a dot_general."""
    k, n = b.shape
    cols = []
    for j in range(n):
        acc = a[..., 0] * b[0, j]
        for kk in range(1, k):
            acc = acc + a[..., kk] * b[kk, j]
        cols.append(acc)
    return jnp.stack(cols, axis=-1)
