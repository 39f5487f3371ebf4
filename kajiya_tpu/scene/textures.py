"""Texture pages: decoded, mip-mapped material textures as dense arrays.

Role of the reference's bindless texture system + BC-compressed GPU images
(`bindless_descriptor_set.rs`, `kajiya-asset/src/image.rs:125-290`). TPUs
have no texture units or BC decoders (SURVEY.md section 2.7 item 5), so the
idiomatic equivalent is decode-at-bake into a fixed-size TEXTURE PAGE ARRAY:

  pages[mip]: (N, S>>mip, S>>mip, 4) uint8   (S = PAGE_SIZE)

Images keep detail through SIZE BUCKETS (cf. the reference's native-res
mips, `image.rs:252-277`): each image is resized to the nearest bucket
(128 ... 2048) and shelf-packed into a page as a subregion, with a
per-slot (page, size, ox, oy) table. One gather stream serves all sizes —
no per-bucket branching in the sampler. The page size ADAPTS to the
largest bucket the scene actually uses (512 minimum), so a test scene
stays small while production 2k textures keep native detail.

Storage is RAW uint8 (exactly the source precision, 4x less gather traffic
than f32). Color-space handling is PER SLOT at fetch time: base color and
emissive decode sRGB->linear after the fetch, normal/metallic-roughness
maps are read linearly — mirroring the reference's TexGamma::{Srgb,Linear}
split (`kajiya-asset/src/mesh.rs`). An image referenced both ways needs no
duplicate page because decode happens at the consumer.

Sampling = manual bilinear/nearest gathers with an explicit mip parameter
(ray-cone LOD lives in the caller). Wrap addressing is exact per texel
within the subregion.
"""
from __future__ import annotations

import base64
import io

import jax.numpy as jnp
import numpy as np

PAGE_SIZE = 512     # minimum page size; grows to the largest used bucket
N_MIPS = 6          # 512 -> 16; scales with the page (mip floor stays 16)
BUCKETS = (2048, 1024, 512, 256, 128)


def _decode_image(path_or_data: str) -> np.ndarray:
    """-> (H, W, 4) uint8, raw values (no color-space conversion).
    PNG/JPG/HDR-LDR/DDS (incl. DXT1/3/5 + uncompressed via PIL's DDS
    plugin — the reference's `image.rs:290-340` DDS path; BC blocks are
    decoded at bake since TPUs have no texture units)."""
    from PIL import Image

    if path_or_data.startswith("data:"):
        header, b64 = path_or_data.split(",", 1)
        img = Image.open(io.BytesIO(base64.b64decode(b64)))
    else:
        img = Image.open(path_or_data)
    img = img.convert("RGBA")
    return np.asarray(img, np.uint8)


def _resize(img: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image

    pil = Image.fromarray(img)
    pil = pil.resize((size, size), Image.LANCZOS)
    return np.asarray(pil, np.uint8)


def _bucket_for(h: int, w: int) -> int:
    m = max(h, w)
    for b in BUCKETS[::-1]:
        if m <= b:
            return b
    return BUCKETS[0]


def build_texture_pages(image_sources, page_size: int | None = None,
                        n_mips: int | None = None):
    """Decode + bucket-resize + shelf-pack + mip a list of image
    paths/data-URIs.

    Returns (pages, page_sub):
      pages: list over mips of (N, s, s, 4) uint8 jnp arrays
      page_sub: (P, 4) int32 [page, size, ox, oy] per image slot; slot 0 is
        a full-page white texture (material slot -1 redirects there).
    Mips are 2x2 box averages of the raw values. page_size defaults to the
    largest bucket actually used (>= PAGE_SIZE); n_mips to log2(page/16)+1
    so the mip floor stays 16^2 regardless of page size."""
    decoded = []
    for src in image_sources:
        try:
            img = _decode_image(src)
        except Exception:
            img = np.full((4, 4, 4), 255, np.uint8)
        decoded.append(img)
    if page_size is None:
        page_size = max([PAGE_SIZE] + [_bucket_for(*d.shape[:2])
                                       for d in decoded])
    if n_mips is None:
        n_mips = int(np.log2(page_size // 16)) + 1
    imgs = [np.full((page_size, page_size, 4), 255, np.uint8)]
    for img in decoded:
        b = _bucket_for(*img.shape[:2])
        imgs.append(_resize(img, b))

    # shelf packing, largest first (stable order preserved via slot index)
    order = sorted(range(len(imgs)), key=lambda i: -imgs[i].shape[0])
    pages_data = []          # list of (page_size, page_size, 4) uint8
    free = []                # list of (page, ox, oy, size) free squares
    sub = [None] * len(imgs)

    def alloc(size):
        # find smallest free square that fits; quad-split the remainder
        cand = [f for f in free if f[3] >= size]
        if not cand:
            pages_data.append(np.zeros((page_size, page_size, 4), np.uint8))
            free.append((len(pages_data) - 1, 0, 0, page_size))
            return alloc(size)
        f = min(cand, key=lambda f: f[3])
        free.remove(f)
        page, ox, oy, fs = f
        while fs > size:
            half = fs // 2
            free.append((page, ox + half, oy, half))
            free.append((page, ox, oy + half, half))
            free.append((page, ox + half, oy + half, half))
            fs = half
        return page, ox, oy, size

    for i in order:
        b = imgs[i].shape[0]
        page, ox, oy, _ = alloc(b)
        pages_data[page][oy:oy + b, ox:ox + b] = imgs[i]
        sub[i] = (page, b, ox, oy)

    base = np.stack(pages_data)
    mips = [base]
    cur = base.astype(np.float32)
    for _ in range(n_mips - 1):
        n, s, _, c = cur.shape
        cur = cur.reshape(n, s // 2, 2, s // 2, 2, c).mean(axis=(2, 4))
        mips.append(np.round(cur).astype(np.uint8))
    # Pack the whole mip chain into ONE (N, S, S + S/2, 4) atlas so the mip
    # becomes an INDEX TRANSFORM instead of an array choice: a per-RAY
    # dynamic mip (ray-cone LOD, `inc/ray_cone.hlsl`) then costs exactly the
    # same single gather as a static mip. Layout: mip 0 at x in [0, S);
    # mip m >= 1 in the right column at x = S, stacked downward
    # (y_m = S - 2*(S >> m)), the classic mip-tail packing.
    s = page_size
    atlas = np.zeros((base.shape[0], s, s + s // 2, 4), np.uint8)
    atlas[:, :, :s] = base
    for m_i in range(1, n_mips):
        sm = s >> m_i
        y0 = s - 2 * sm
        atlas[:, y0:y0 + sm, s:s + sm] = mips[m_i]
    return jnp.asarray(atlas), jnp.asarray(np.asarray(sub, np.int32))


def _decode_fetch(texel_u8, srgb: bool):
    """uint8 (..., 4) -> float32 [0,1], optionally sRGB->linear on rgb."""
    x = texel_u8.astype(jnp.float32) * (1.0 / 255.0)
    if not srgb:
        return x
    from ..core.color import srgb_decode

    rgb = srgb_decode(x[..., :3])
    return jnp.concatenate([rgb, x[..., 3:4]], axis=-1)


def sample_pages(pages, page_sub, page_idx, uv, mip=0, nearest: bool = False,
                 srgb: bool = False, lod_base=None):
    """Texture fetch from the packed mip atlas. page_idx: (...,) int32 slot
    (0 = white), uv: (..., 2). Returns (..., 4) float32.

    mip: static int, or a (...,) int32 array — the atlas packing makes a
    per-ray mip the same single gather as a static one. lod_base: per-ray
    ray-cone LOD term (`inc/ray_cone.hlsl` / `gbuffer.rchit.hlsl:29-44`
    lambda WITHOUT its texture-size term); the final level is
    lod_base + log2(texture_size), computed here per slot because each
    material map has its own resolution. Overrides `mip` when given.

    `nearest=True` costs ONE gather instead of four — used for non-color
    maps (MR/emissive/normal), where TPU gather latency dominates and
    bilinear smoothing matters least. `srgb=True` decodes rgb to linear
    after the fetch (base color/emissive slots; cf. TexGamma::Srgb in the
    reference's asset pipeline)."""
    tex = pages                           # (N, s, s + s//2, 4) uint8 atlas
    n, s = tex.shape[0], tex.shape[1]
    n_mips = int(np.log2(s // 16)) + 1
    p = jnp.clip(page_idx, 0, page_sub.shape[0] - 1)
    meta = page_sub[p]                    # (..., 4): page, size, ox, oy
    page = jnp.clip(meta[..., 0], 0, n - 1)
    size0 = meta[..., 1]
    if lod_base is not None:
        # nearest-mip selection (hardware trilinear's fractional blend is
        # two gathers; the TAA jitter dithers the transition instead)
        mip = jnp.clip(jnp.round(
            lod_base + jnp.log2(size0.astype(jnp.float32))
        ).astype(jnp.int32), 0, n_mips - 1)
    else:
        mip = jnp.minimum(jnp.asarray(mip, jnp.int32), n_mips - 1)
    size = size0 >> mip                   # subregion size at this mip
    # atlas placement of mip m: m=0 at (0, 0); m>=1 right column at
    # x = s, y = s - 2*(s >> m) (see build_texture_pages)
    in_tail = mip > 0
    sm = s >> jnp.maximum(mip, 1)
    ox = (meta[..., 2] >> mip) + jnp.where(in_tail, s, 0)
    oy = (meta[..., 3] >> mip) + jnp.where(in_tail, s - 2 * sm, 0)
    sizef = size.astype(jnp.float32)

    u = uv[..., 0] - jnp.floor(uv[..., 0])    # wrap addressing
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    if nearest:
        xi = jnp.clip((u * sizef).astype(jnp.int32), 0, size - 1) + ox
        yi = jnp.clip((v * sizef).astype(jnp.int32), 0, size - 1) + oy
        return _decode_fetch(tex[page, yi, xi], srgb)
    x = u * sizef - 0.5
    y = v * sizef - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), size)
    x1i = jnp.mod(x0i + 1, size)
    y0i = jnp.mod(y0.astype(jnp.int32), size)
    y1i = jnp.mod(y0i + 1, size)
    c00 = tex[page, y0i + oy, x0i + ox].astype(jnp.float32)
    c10 = tex[page, y0i + oy, x1i + ox].astype(jnp.float32)
    c01 = tex[page, y1i + oy, x0i + ox].astype(jnp.float32)
    c11 = tex[page, y1i + oy, x1i + ox].astype(jnp.float32)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    out = (top * (1 - fy) + bot * fy) * (1.0 / 255.0)
    if srgb:
        from ..core.color import srgb_decode

        out = jnp.concatenate([srgb_decode(out[..., :3]), out[..., 3:4]], -1)
    return out
