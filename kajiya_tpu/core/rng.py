"""Hash-based counter RNG for shader-style stochastic sampling.

The reference uses per-pixel integer hash chains in HLSL
(`assets/shaders/inc/hash.hlsl`, used by e.g. `inc/reservoir.hlsl:47-77`) plus
quasi-random sequences (`inc/quasi_random.hlsl`). On TPU we keep the same
counter-hash design: it is stateless, vectorizes perfectly on the VPU
(uint32 ops), is deterministic across shardings, and avoids the cost of
threefry for the very large per-pixel stream counts a renderer needs.

All functions operate elementwise on uint32 arrays of any shape.
"""
from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32


def _u32(x):
    return jnp.asarray(x, dtype=U32)


def pcg_hash(x):
    """PCG output-permutation hash of a uint32 lattice (O'Neill / JCGT 2020)."""
    x = _u32(x)
    state = x * U32(747796405) + U32(2891336453)
    word = ((state >> (state >> U32(28)) + U32(4)) ^ state) * U32(277803737)
    return (word >> U32(22)) ^ word


def hash_combine(a, b):
    """Combine two uint32 streams into one (order-sensitive)."""
    return pcg_hash(_u32(a) ^ (_u32(b) * U32(0x9E3779B9)))


def hash3(a, b, c):
    return hash_combine(hash_combine(a, b), c)


def u01(bits):
    """uint32 -> float32 in [0, 1). Uses the top 24 bits for an exact mantissa."""
    return (jnp.asarray(bits, U32) >> U32(8)).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def pixel_rng(px_x, px_y, frame_idx, stream: int = 0):
    """Per-pixel, per-frame decorrelated uint32 seed lattice.

    Mirrors the role of the reference's per-pixel `rng` seeds passed through
    reservoir updates (`inc/reservoir.hlsl:47`), with an extra `stream` axis so
    independent passes never share a sequence.
    """
    return hash_combine(hash3(px_x, px_y, frame_idx), U32(0x85EBCA6B) + U32(stream))


def next_rng(rng):
    """Advance a seed lattice one step (analog of `hash1_mut`)."""
    return pcg_hash(rng)


def rand_u01(rng):
    """Draw one float in [0,1) and return (value, advanced rng)."""
    rng2 = next_rng(rng)
    return u01(rng2), rng2


# ----------------------------------------------------------------------------
# Quasi-random: radical-inverse / Halton — the reference feeds TAA jitter from
# a 128-entry Halton(2,3) sequence (`world_renderer.rs:425-428`) and shaders
# from R2/sobol sequences (`inc/quasi_random.hlsl`).
# ----------------------------------------------------------------------------

def radical_inverse(n: int, base: int) -> float:
    val, inv_b, f = 0.0, 1.0 / base, 1.0 / base
    while n > 0:
        val += (n % base) * f
        n //= base
        f *= inv_b
    return val


def halton23_sequence(count: int):
    """(count, 2) float32 Halton(2,3) points in [0,1)^2, 1-based like the reference."""
    import numpy as np

    pts = np.array(
        [[radical_inverse(i + 1, 2), radical_inverse(i + 1, 3)] for i in range(count)],
        dtype=np.float32,
    )
    return pts


_PLASTIC_A1 = 0.7548776662466927  # 1/phi2
_PLASTIC_A2 = 0.5698402909980532  # 1/phi2^2


def r2_sequence(n, offset=0.5):
    """R2 low-discrepancy sequence (Roberts), the shader-side QMC workhorse."""
    n = jnp.asarray(n, jnp.float32)
    return jnp.stack(
        [jnp.mod(offset + _PLASTIC_A1 * n, 1.0), jnp.mod(offset + _PLASTIC_A2 * n, 1.0)],
        axis=-1,
    )
