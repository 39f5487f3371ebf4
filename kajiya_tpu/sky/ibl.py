"""Image-based lighting: HDR environment maps replacing the procedural sky.

Role of `renderers/ibl.rs:18-172`: load a Radiance .hdr (or .exr when an
EXR reader is available) lat-long panorama and use it as the sky cube.
Includes a minimal pure-numpy Radiance RGBE decoder (new-style RLE), since
no HDR library is baked into the image — the reference similarly carries its
own loaders through the `image` crate.

The panorama is resampled into the same octahedral layout the rest of the
sky system uses (sky/env.py), so `build_sky_env`'s output is swappable.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from .env import SKY_RES, oct_decode


def load_hdr(path: str) -> np.ndarray:
    """Radiance .hdr (RGBE) -> (H, W, 3) float32 linear radiance."""
    with open(path, "rb") as f:
        data = f.read()
    # --- header
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError("not a Radiance HDR file")
    pos = data.index(b"\n\n") + 2
    dim_end = data.index(b"\n", pos)
    dims = data[pos:dim_end].split()
    if dims[0] != b"-Y" or dims[2] != b"+X":
        raise ValueError(f"unsupported HDR orientation {dims}")
    h, w = int(dims[1]), int(dims[3])
    buf = data[dim_end + 1:]

    rgbe = np.zeros((h, w, 4), np.uint8)
    off = 0
    for y in range(h):
        # new-style RLE scanline?
        if w >= 8 and w < 32768 and buf[off] == 2 and buf[off + 1] == 2:
            assert (buf[off + 2] << 8 | buf[off + 3]) == w
            off += 4
            for c in range(4):
                x = 0
                while x < w:
                    n = buf[off]; off += 1
                    if n > 128:
                        rgbe[y, x:x + n - 128, c] = buf[off]
                        off += 1
                        x += n - 128
                    else:
                        rgbe[y, x:x + n, c] = np.frombuffer(
                            buf, np.uint8, n, off)
                        off += n
                        x += n
        else:  # flat RGBE
            row = np.frombuffer(buf, np.uint8, w * 4, off).reshape(w, 4)
            rgbe[y] = row
            off += w * 4

    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp == 0, 0.0,
                     np.ldexp(1.0, exp - 136)).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * scale[..., None]


def load_exr(path: str) -> np.ndarray:
    """EXR via imageio/OpenEXR when present; raises otherwise (gated dep)."""
    try:
        import imageio.v3 as iio

        return np.asarray(iio.imread(path), np.float32)[..., :3]
    except ImportError as e:
        raise RuntimeError(
            "no EXR reader available in this environment") from e


def panorama_to_env(pano: np.ndarray, res: int = SKY_RES,
                    rotation_deg: float = 0.0):
    """Lat-long (H, W, 3) -> octahedral (res, res, 3) env map (jnp).
    +Y is up; rotation spins the panorama around +Y (ibl.rs exposes the
    same control)."""
    dirs = np.asarray(oct_decode(
        (np.stack(np.meshgrid(np.arange(res), np.arange(res),
                              indexing="xy"), -1) + 0.5) / res))
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    theta = np.arccos(np.clip(y, -1, 1))            # 0 at +Y
    phi = np.arctan2(z, x) + np.deg2rad(rotation_deg)
    u = (phi / (2 * np.pi)) % 1.0
    v = theta / np.pi
    h, w = pano.shape[:2]
    xi = np.clip((u * w).astype(np.int32), 0, w - 1)
    yi = np.clip((v * h).astype(np.int32), 0, h - 1)
    return jnp.asarray(pano[yi, xi])


def load_ibl_env(path: str, res: int = SKY_RES, rotation_deg: float = 0.0):
    """Load .hdr/.exr -> octahedral env map ready for the frame's sky slot."""
    ext = os.path.splitext(path)[1].lower()
    pano = load_hdr(path) if ext == ".hdr" else load_exr(path)
    return panorama_to_env(pano, res, rotation_deg)
