"""Sampling primitives: bases, hemispheres, cones, triangles.

Role of the reference's `inc/quasi_random.hlsl` + sampling helpers in
`inc/brdf.hlsl`. Everything is elementwise over batched inputs (..., 3).
"""
from __future__ import annotations

import jax.numpy as jnp


def orthonormal_basis(n):
    """Branchless ONB from a unit normal (Duff et al. 2017). Returns (t, b)."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack([1.0 + s * n[..., 0] ** 2 * a, s * b, -s * n[..., 0]], axis=-1)
    bt = jnp.stack([b, s + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return t, bt


def to_world(n, v_local):
    """Local (tangent-space, +Z = n) direction -> world."""
    t, b = orthonormal_basis(n)
    return (t * v_local[..., 0:1] + b * v_local[..., 1:2] + n * v_local[..., 2:3])


def cosine_hemisphere(u1, u2):
    """Cosine-weighted hemisphere sample in local space (+Z up). pdf = cos/pi."""
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    return jnp.stack([x, y, z], axis=-1)


def uniform_cone(u1, u2, cos_theta_max):
    """Uniform direction in a cone around +Z. pdf = 1/(2pi(1-cos_max))."""
    cos_t = 1.0 - u1 * (1.0 - cos_theta_max)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def uniform_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_triangle(u1, u2):
    """Uniform barycentrics on a triangle (sqrt parameterization)."""
    su = jnp.sqrt(u1)
    b1 = 1.0 - su
    b2 = u2 * su
    return b1, b2


def power_heuristic(pdf_a, pdf_b):
    """MIS power heuristic (beta=2) weight for strategy a."""
    a2 = pdf_a * pdf_a
    return a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-20)
