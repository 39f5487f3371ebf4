"""Sky environment + convolved irradiance maps (octahedral layout).

Role of `renderers/sky.rs:4-32`: a 64x64x6 sky cube rebuilt every frame plus
a 16x16x6 cosine-convolved diffuse cube. TPU-first re-design: a single
equal-area OCTAHEDRAL 2D map replaces the cube (one dense array, no face
seams in gather code), and the cosine convolution is expressed as one matmul
over all texels — (dirs x texels) @ (texels x 3) — which runs on the MXU
instead of 6 faces of gather loops.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from .atmosphere import sky_radiance

SKY_RES = 64          # ~ the reference's 64x64 cube faces
DIFFUSE_RES = 16      # ~ the 16x16 convolved cube


def oct_encode(d):
    """Unit direction -> octahedral uv in [0,1]^2 (elementwise, jnp)."""
    ad = jnp.abs(d)
    inv_l1 = 1.0 / jnp.maximum(ad[..., 0] + ad[..., 1] + ad[..., 2], 1e-12)
    x = d[..., 0] * inv_l1
    y = d[..., 1] * inv_l1
    # fold the lower hemisphere
    xf = jnp.where(d[..., 2] < 0.0,
                   (1.0 - jnp.abs(y)) * jnp.sign(x + 1e-20), x)
    yf = jnp.where(d[..., 2] < 0.0,
                   (1.0 - jnp.abs(x)) * jnp.sign(y + 1e-20), y)
    return jnp.stack([xf * 0.5 + 0.5, yf * 0.5 + 0.5], axis=-1)


def oct_decode(uv):
    """Octahedral uv in [0,1]^2 -> unit direction."""
    f = uv * 2.0 - 1.0
    x, y = f[..., 0], f[..., 1]
    z = 1.0 - jnp.abs(x) - jnp.abs(y)
    xf = jnp.where(z < 0.0, (1.0 - jnp.abs(y)) * jnp.sign(x + 1e-20), x)
    yf = jnp.where(z < 0.0, (1.0 - jnp.abs(x)) * jnp.sign(y + 1e-20), y)
    d = jnp.stack([xf, yf, z], axis=-1)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


def _texel_dirs(res: int):
    uv = (jnp.stack(jnp.meshgrid(jnp.arange(res), jnp.arange(res),
                                 indexing="xy"), -1) + 0.5) / res
    return oct_decode(uv.astype(jnp.float32))


def build_sky_env(sun_direction, res: int = SKY_RES):
    """(res, res, 3) octahedral sky radiance map ('sky cube' pass)."""
    dirs = _texel_dirs(res)
    # the atmosphere treats +Y as up; our oct map stores raw world dirs
    return sky_radiance(dirs.reshape(-1, 3), sun_direction).reshape(res, res, 3)


@lru_cache(maxsize=4)
def _convolve_matrix(res_in: int, res_out: int):
    """(res_out^2, res_in^2) cosine-convolution weights, host-precomputed.
    Equal-area oct mapping => uniform texel solid angle = 4pi/res_in^2."""
    uv_i = (np.stack(np.meshgrid(np.arange(res_in), np.arange(res_in),
                                 indexing="xy"), -1) + 0.5) / res_in
    f = uv_i * 2.0 - 1.0
    x, y = f[..., 0], f[..., 1]
    z = 1.0 - np.abs(x) - np.abs(y)
    xf = np.where(z < 0, (1 - np.abs(y)) * np.sign(x + 1e-20), x)
    yf = np.where(z < 0, (1 - np.abs(x)) * np.sign(y + 1e-20), y)
    di = np.stack([xf, yf, z], -1)
    di /= np.maximum(np.linalg.norm(di, axis=-1, keepdims=True), 1e-12)

    uv_o = (np.stack(np.meshgrid(np.arange(res_out), np.arange(res_out),
                                 indexing="xy"), -1) + 0.5) / res_out
    fo = uv_o * 2.0 - 1.0
    xo, yo = fo[..., 0], fo[..., 1]
    zo = 1.0 - np.abs(xo) - np.abs(yo)
    xof = np.where(zo < 0, (1 - np.abs(yo)) * np.sign(xo + 1e-20), xo)
    yof = np.where(zo < 0, (1 - np.abs(xo)) * np.sign(yo + 1e-20), yo)
    do = np.stack([xof, yof, zo], -1)
    do /= np.maximum(np.linalg.norm(do, axis=-1, keepdims=True), 1e-12)

    cosw = np.maximum(do.reshape(-1, 3) @ di.reshape(-1, 3).T, 0.0)
    d_omega = 4.0 * np.pi / (res_in * res_in)
    # E(n)/pi so the result multiplies straight against diffuse albedo/pi-less
    return (cosw * (d_omega / np.pi)).astype(np.float32)


def convolve_diffuse(env, res_out: int = DIFFUSE_RES):
    """Cosine-convolve a sky map -> (res_out, res_out, 3) irradiance/pi map
    (the 'convolve sky' pass). One MXU matmul."""
    from ..ops.smallvec import dot_pad_n

    res_in = env.shape[0]
    m = jnp.asarray(_convolve_matrix(res_in, res_out))
    out = dot_pad_n(m, env.reshape(-1, 3))
    return out.reshape(res_out, res_out, 3)


def sample_env(env, d):
    """Fetch environment radiance along direction d. `env` may be an
    octahedral map (bilinear gather) OR a callable d -> radiance (gather-free
    analytic sky / SH ambient) — every pass accepts both."""
    if callable(env):
        return env(d)
    from ..core import img as im

    return im.sample_bilinear(env, oct_encode(d))


# ----------------------------------------------------------------------------
# L2 spherical-harmonic ambient: replaces the convolved-irradiance MAP fetch
# (4 gathers per shading point) with a 9-term polynomial in the normal —
# pure VPU math. Projection over the oct texels is one small matmul.
# ----------------------------------------------------------------------------

_SH_C = (0.28209479, 0.48860251, 1.09254843, 0.31539157, 0.54627421)
# Lambertian convolution factors per band (A_0, A_1, A_2)
_A = (3.141593, 2.094395, 0.785398)


def _sh9_basis(d):
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    c = _SH_C
    return jnp.stack([
        jnp.full_like(x, c[0]),
        c[1] * y, c[1] * z, c[1] * x,
        c[2] * x * y, c[2] * y * z,
        c[3] * (3.0 * z * z - 1.0),
        c[2] * x * z, 0.5 * c[2] * (x * x - y * y),
    ], axis=-1)


@lru_cache(maxsize=4)
def _sh9_project_matrix(res: int):
    # pure numpy (host constant; must not trace)
    uv = (np.stack(np.meshgrid(np.arange(res), np.arange(res),
                               indexing="xy"), -1) + 0.5) / res
    f = uv * 2.0 - 1.0
    x, y = f[..., 0], f[..., 1]
    z = 1.0 - np.abs(x) - np.abs(y)
    xf = np.where(z < 0, (1 - np.abs(y)) * np.sign(x + 1e-20), x)
    yf = np.where(z < 0, (1 - np.abs(x)) * np.sign(y + 1e-20), y)
    d = np.stack([xf, yf, z], -1).reshape(-1, 3)
    d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    c = _SH_C
    b = np.stack([
        np.full_like(x, c[0]), c[1] * y, c[1] * z, c[1] * x,
        c[2] * x * y, c[2] * y * z, c[3] * (3 * z * z - 1),
        c[2] * x * z, 0.5 * c[2] * (x * x - y * y)], axis=-1)   # (T, 9)
    d_omega = 4.0 * np.pi / (res * res)
    return (b * d_omega).astype(np.float32)


def project_sh9(env_map):
    """(res, res, 3) radiance map -> (9, 3) SH radiance coefficients."""
    from ..ops.smallvec import dot_pad_n

    res = env_map.shape[0]
    m = jnp.asarray(_sh9_project_matrix(res))
    return dot_pad_n(m.T, env_map.reshape(-1, 3))


def sh9_radiance_fn(sh_coeffs):
    """Returns a callable d -> L(d): the SH9-reconstructed RADIANCE.

    Role of the reference's 64x64 sky cube fetch at secondary hits
    (`rt/gbuffer.rmiss.hlsl` samples `sky_cube_tex`, not the analytic
    atmosphere): GI rays average the sky, so a smooth 9-term reconstruction
    replaces a per-ray 6-step Rayleigh/Mie march (~30 VPU flops instead of
    hundreds incl. transcendentals, measured ~3 ms/frame at the 1080p GI
    wavefront). The sun disk is NOT in this term — direct sun is explicit
    NEE everywhere (hit_lighting.py)."""
    def fetch(d):
        from ..ops.smallvec import matmul_small

        basis = _sh9_basis(d)
        return jnp.maximum(matmul_small(basis, sh_coeffs), 0.0)

    return fetch


def sh9_irradiance_fn(sh_coeffs):
    """Returns a callable n -> E(n)/pi from SH radiance coefficients (the
    gather-free stand-in for the convolved diffuse map)."""
    a = jnp.asarray([_A[0]] + [_A[1]] * 3 + [_A[2]] * 5, jnp.float32)
    conv = sh_coeffs * a[:, None] / jnp.pi      # fold the /pi in

    def fetch(n):
        from ..ops.smallvec import matmul_small

        basis = _sh9_basis(n)
        return jnp.maximum(matmul_small(basis, conv), 0.0)

    return fetch
