"""Screen-tile reordering for coherent ray chunks.

The culled brute tracer (ops/woop.py) tests cluster AABBs once per ray
CHUNK; a chunk of 8192 rays taken in scanline order spans several full image
rows — a frustum that touches most of the scene. Reordered into compact 2D
tiles (64 x 128 = one chunk), each chunk's frustum is a narrow pencil and the
cull skips almost everything. Pure reshape/transpose both ways — no gathers.
"""
from __future__ import annotations

import jax.numpy as jnp

TILE_H = 64
TILE_W = 128    # TILE_H * TILE_W == woop.CULLED_RAY_BLOCK


def pad_hw(h: int, w: int, th: int = TILE_H, tw: int = TILE_W):
    return (-h) % th, (-w) % tw


def tile_order(img, th: int = TILE_H, tw: int = TILE_W):
    """(H, W, ...) -> (N, ...) flattened in tile-major order (edge-padded)."""
    h, w = img.shape[0], img.shape[1]
    ph, pw = pad_hw(h, w, th, tw)
    if ph or pw:
        pad = [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2)
        img = jnp.pad(img, pad, mode="edge")
    hh, ww = img.shape[0], img.shape[1]
    x = img.reshape((hh // th, th, ww // tw, tw) + img.shape[2:])
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape((-1,) + img.shape[2:])


def untile_order(flat, h: int, w: int, th: int = TILE_H, tw: int = TILE_W):
    """Inverse of tile_order: (N, ...) -> (H, W, ...) with padding cropped."""
    ph, pw = pad_hw(h, w, th, tw)
    hh, ww = h + ph, w + pw
    x = flat.reshape((hh // th, ww // tw, th, tw) + flat.shape[1:])
    x = jnp.swapaxes(x, 1, 2)
    x = x.reshape((hh, ww) + flat.shape[1:])
    return x[:h, :w]
