"""Texture pages: decoded, mip-mapped material textures as dense arrays.

Role of the reference's bindless texture system + BC-compressed GPU images
(`bindless_descriptor_set.rs`, `kajiya-asset/src/image.rs:125-290`). TPUs
have no texture units or BC decoders (SURVEY.md section 2.7 item 5), so the
idiomatic equivalent is decode-at-bake into a fixed-size TEXTURE PAGE ARRAY:

  pages[mip]: (N, S>>mip, S>>mip, 4) float32  (S = PAGE_SIZE)

Every image is resized to S x S at load (the fixed page size is what makes
the shape static for XLA; the reference's bindless array is likewise bounded
by `max_bindless_descriptor_count`). Sampling = manual bilinear gathers with
an explicit mip parameter (ray-cone LOD lives in the caller).
"""
from __future__ import annotations

import base64
import io
import os

import jax.numpy as jnp
import numpy as np

PAGE_SIZE = 256
N_MIPS = 5          # 256 -> 16


def _decode_image(path_or_data: str) -> np.ndarray:
    """-> (H, W, 4) float32 in [0,1], sRGB decoded to linear for color maps
    is the caller's choice; we return raw values."""
    from PIL import Image

    if path_or_data.startswith("data:"):
        header, b64 = path_or_data.split(",", 1)
        img = Image.open(io.BytesIO(base64.b64decode(b64)))
    else:
        img = Image.open(path_or_data)
    img = img.convert("RGBA")
    return np.asarray(img, np.float32) / 255.0


def _resize(img: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image

    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    pil = pil.resize((size, size), Image.LANCZOS)
    return np.asarray(pil, np.float32) / 255.0


def build_texture_pages(image_sources, page_size: int = PAGE_SIZE,
                        n_mips: int = N_MIPS, srgb: bool = True):
    """Decode + resize + mip a list of image paths/data-URIs.

    Returns list over mips of (N, s, s, 4) float32 jnp arrays (N >= 1; a
    1-page white texture is always present at index 0 so material slot -1
    can be redirected there). Mips use 2x2 box (Lanczos at base)."""
    from ..core.color import srgb_decode

    pages = [np.ones((1, page_size, page_size, 4), np.float32)]
    for src in image_sources:
        try:
            img = _decode_image(src)
        except Exception:
            img = np.ones((4, 4, 4), np.float32)
        img = _resize(img, page_size)
        pages.append(img[None])
    base = np.concatenate(pages, axis=0)
    if srgb:
        base[..., :3] = np.asarray(srgb_decode(jnp.asarray(base[..., :3])))

    mips = [base]
    cur = base
    for _ in range(n_mips - 1):
        n, s, _, c = cur.shape
        cur = cur.reshape(n, s // 2, 2, s // 2, 2, c).mean(axis=(2, 4))
        mips.append(cur)
    return [jnp.asarray(m) for m in mips]


def sample_pages(pages, page_idx, uv, mip=0, nearest: bool = False):
    """Texture fetch. page_idx: (...,) int32 (0 = white), uv: (..., 2),
    mip: static int. Returns (..., 4). `nearest=True` costs ONE gather
    instead of four — used for non-color maps (MR/emissive/normal), where
    TPU gather latency dominates and bilinear smoothing matters least."""
    tex = pages[mip]                      # (N, s, s, 4)
    n, s = tex.shape[0], tex.shape[1]
    u = uv[..., 0] - jnp.floor(uv[..., 0])    # wrap addressing
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    p = jnp.clip(page_idx, 0, n - 1)
    if nearest:
        xi = jnp.clip((u * s).astype(jnp.int32), 0, s - 1)
        yi = jnp.clip((v * s).astype(jnp.int32), 0, s - 1)
        return tex[p, yi, xi]
    x = u * s - 0.5
    y = v * s - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), s)
    x1i = jnp.mod(x0i + 1, s)
    y0i = jnp.mod(y0.astype(jnp.int32), s)
    y1i = jnp.mod(y0i + 1, s)
    c00 = tex[p, y0i, x0i]
    c10 = tex[p, y0i, x1i]
    c01 = tex[p, y1i, x0i]
    c11 = tex[p, y1i, x1i]
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy
