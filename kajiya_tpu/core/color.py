"""Color math: sRGB transfer, luminance, tonemap working-space helpers.

Covers the roles of the reference's `inc/color.hlsl`,
`inc/working_color_space.hlsl` and parts of `post_combine.hlsl`.
"""
from __future__ import annotations

import jax.numpy as jnp

_LUMA = (0.2126, 0.7152, 0.0722)  # Rec.709


def luminance(rgb):
    # explicit channel math: a weighted minor-dim reduce lowers to a tiny-N
    # dot, which is pathological on this TPU stack (see ops/smallvec.py)
    return (rgb[..., 0] * _LUMA[0] + rgb[..., 1] * _LUMA[1]
            + rgb[..., 2] * _LUMA[2])


def srgb_encode(linear):
    linear = jnp.maximum(linear, 0.0)
    lo = linear * 12.92
    hi = 1.055 * jnp.power(jnp.maximum(linear, 1e-8), 1.0 / 2.4) - 0.055
    return jnp.where(linear <= 0.0031308, lo, hi)


def srgb_decode(srgb):
    srgb = jnp.maximum(srgb, 0.0)
    lo = srgb / 12.92
    hi = jnp.power((srgb + 0.055) / 1.055, 2.4)
    return jnp.where(srgb <= 0.04045, lo, hi)


def lin_to_ycbcr(rgb):
    """Linear RGB -> YCbCr-ish decorrelated space used for temporal clamps."""
    y = luminance(rgb)
    cb = rgb[..., 2] - y
    cr = rgb[..., 0] - y
    return jnp.stack([y, cb, cr], axis=-1)


def ycbcr_to_lin(ycc):
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    r = cr + y
    b = cb + y
    g = (y - 0.2126 * r - 0.0722 * b) / 0.7152
    return jnp.stack([r, g, b], axis=-1)
