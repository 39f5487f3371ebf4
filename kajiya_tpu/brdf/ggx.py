"""Layered GGX + Lambert BRDF: eval, VNDF sampling, pdfs, energy compensation.

Functional equivalent of the reference's BRDF stack
(`assets/shaders/inc/brdf.hlsl`, `inc/layered_brdf.hlsl`, `inc/brdf_lut.hlsl`:
GGX specular with Smith height-correlated masking, VNDF importance sampling,
Schlick Fresnel, energy-preserving multi-scatter compensation via an FG LUT
computed at startup — cf. `lut_renderers.rs:12-46` which also computes it at
runtime — layered over a Lambertian base weighted by (1 - F) and metalness).

All functions are elementwise over leading batch dims. Directions are unit,
in WORLD space with the shading normal supplied; `wi` = towards light,
`wo` = towards viewer, both pointing AWAY from the surface.
"""
from __future__ import annotations

import jax.numpy as jnp

from .sampling import orthonormal_basis

MIN_ROUGHNESS = 1e-3


def f_schlick(f0, cos_theta):
    return f0 + (1.0 - f0) * jnp.power(jnp.clip(1.0 - cos_theta, 0.0, 1.0), 5.0)


def ndf_ggx(a2, ndoth):
    d = ndoth * ndoth * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * d * d, 1e-12)


def g_smith_correlated(a2, ndotv, ndotl):
    """Height-correlated Smith visibility term V = G / (4 ndotv ndotl)."""
    lv = ndotl * jnp.sqrt((ndotv - a2 * ndotv) * ndotv + a2)
    ll = ndotv * jnp.sqrt((ndotl - a2 * ndotl) * ndotl + a2)
    return 0.5 / jnp.maximum(lv + ll, 1e-12)


def specular_brdf(f0, roughness, n, wo, wi):
    """GGX specular BRDF value (RGB) and its VNDF sampling pdf."""
    a = jnp.maximum(roughness, MIN_ROUGHNESS) ** 2
    a2 = a * a
    h = wo + wi
    h = h * (1.0 / jnp.maximum(jnp.sqrt(jnp.maximum(_dot(h, h), 1e-24)), 1e-12))[..., None]
    ndoth = jnp.clip(_dot(n, h), 0.0, 1.0)
    ndotv = jnp.clip(_dot(n, wo), 1e-5, 1.0)
    ndotl = jnp.clip(_dot(n, wi), 0.0, 1.0)
    hdotv = jnp.clip(_dot(h, wo), 1e-5, 1.0)
    d = ndf_ggx(a2, ndoth)
    vis = g_smith_correlated(a2, ndotv, ndotl)
    f = f_schlick(f0, hdotv[..., None])
    brdf = f * (d * vis)[..., None]
    # VNDF pdf: D * G1(wo) * hdotv / (ndotv * 4 * hdotv) = D * G1 / (4 ndotv)
    g1 = _g1_smith(a2, ndotv)
    pdf = d * g1 / jnp.maximum(4.0 * ndotv, 1e-12)
    return brdf, pdf


def _g1_smith(a2, ndotx):
    return 2.0 * ndotx / jnp.maximum(ndotx + jnp.sqrt(a2 + (1.0 - a2) * ndotx * ndotx), 1e-12)


def _dot(a, b):
    return (a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]
            + a[..., 2] * b[..., 2])


def sample_vndf(roughness, n, wo, u1, u2):
    """Sample a GGX half-vector with the visible-NDF method (Heitz 2018).
    Returns world-space wi (reflected wo) — may point below the surface."""
    a = jnp.maximum(roughness, MIN_ROUGHNESS) ** 2
    t, b = orthonormal_basis(n)
    # wo in local space
    vo = jnp.stack([_dot(wo, t), _dot(wo, b), _dot(wo, n)], axis=-1)
    vh = jnp.stack([a * vo[..., 0], a * vo[..., 1], vo[..., 2]], axis=-1)
    vh = vh * (1.0 / jnp.maximum(jnp.sqrt(jnp.maximum(_dot(vh, vh), 1e-24)), 1e-12))[..., None]
    # orthonormal frame around vh
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-12))
    t1 = jnp.where(
        (lensq > 1e-9)[..., None],
        jnp.stack([-vh[..., 1] * inv, vh[..., 0] * inv, jnp.zeros_like(inv)], axis=-1),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], vh.dtype), vh.shape),
    )
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1)) + s * p2
    pz = jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))
    nh = t1 * p1[..., None] + t2 * p2[..., None] + vh * pz[..., None]
    # unstretch
    h_local = jnp.stack(
        [a * nh[..., 0], a * nh[..., 1], jnp.maximum(nh[..., 2], 1e-6)], axis=-1)
    h_local = h_local * (1.0 / jnp.maximum(jnp.sqrt(jnp.maximum(_dot(h_local, h_local), 1e-24)), 1e-12))[..., None]
    h_world = t * h_local[..., 0:1] + b * h_local[..., 1:2] + n * h_local[..., 2:3]
    wi = 2.0 * _dot(wo, h_world)[..., None] * h_world - wo
    return wi


def pdf_vndf(roughness, n, wo, wi):
    """Solid-angle pdf of `sample_vndf` for direction wi:
    pdf = G1(wo) * D(h) / (4 * n.wo)  (Heitz 2018, eq. 3 with the reflect
    Jacobian folded in). Used as the ReSTIR source pdf for reflection
    candidates (`rtr_restir_temporal.hlsl` counterpart)."""
    a = jnp.maximum(roughness, MIN_ROUGHNESS) ** 2
    a2 = a * a
    h = wi + wo
    h = h * (1.0 / jnp.maximum(jnp.sqrt(jnp.maximum(_dot(h, h), 1e-24)), 1e-12))[..., None]
    ndotv = jnp.maximum(_dot(n, wo), 1e-6)
    ndoth = jnp.clip(_dot(n, h), 0.0, 1.0)
    d = ndf_ggx(a2, ndoth)
    g1 = _g1_smith(a2, ndotv)
    return jnp.maximum(g1 * d / (4.0 * ndotv), 1e-12)


# ----------------------------------------------------------------------------
# Preintegrated FG (Fresnel-Geometry) energy LUT, computed once at import
# (counterpart of `lut/brdf_fg.hlsl` computed once at startup).
# ----------------------------------------------------------------------------

_FG_RES = 64
_FG_LUT = None


def _compute_fg_lut():
    """(R, V, 2) table of split-sum (scale, bias) for F0: integral of GGX."""
    import numpy as np

    res = _FG_RES
    n_samples = 256
    rough = (np.arange(res) + 0.5) / res
    ndotv = (np.arange(res) + 0.5) / res
    out = np.zeros((res, res, 2), np.float32)
    # Golden-ratio sequence for the integration
    i = np.arange(n_samples)
    u1 = (i + 0.5) / n_samples
    u2 = (i * 0.6180339887498949) % 1.0
    for ri, r in enumerate(rough):
        a = max(r, MIN_ROUGHNESS) ** 2
        a2 = a * a
        # GGX NDF sample (not VNDF; classic split-sum integration)
        cos_h = np.sqrt((1.0 - u1) / (1.0 + (a2 - 1.0) * u1))
        sin_h = np.sqrt(np.maximum(0.0, 1.0 - cos_h**2))
        phi = 2.0 * np.pi * u2
        h = np.stack([sin_h * np.cos(phi), sin_h * np.sin(phi), cos_h], -1)
        for vi, nv in enumerate(ndotv):
            v = np.array([np.sqrt(max(0.0, 1 - nv * nv)), 0.0, nv])
            l = 2.0 * (h @ v)[:, None] * h - v
            nl = np.clip(l[:, 2], 0, 1)
            nh = np.clip(h[:, 2], 0, 1)
            vh = np.clip(h @ v, 1e-5, 1)
            mask = nl > 0
            g1l = 2 * nl / np.maximum(nl + np.sqrt(a2 + (1 - a2) * nl * nl), 1e-9)
            g1v = 2 * nv / np.maximum(nv + np.sqrt(a2 + (1 - a2) * nv * nv), 1e-9)
            g = g1l * g1v
            g_vis = g * vh / np.maximum(nh * nv, 1e-9)
            fc = (1.0 - vh) ** 5
            out[ri, vi, 0] = np.sum(np.where(mask, (1 - fc) * g_vis, 0)) / n_samples
            out[ri, vi, 1] = np.sum(np.where(mask, fc * g_vis, 0)) / n_samples
    return out


def fg_lut():
    # Cache as numpy (host constant); jnp.asarray per call stays trace-safe.
    global _FG_LUT
    if _FG_LUT is None:
        _FG_LUT = _compute_fg_lut()
    return jnp.asarray(_FG_LUT)


_FG_POLY = None
_POLY_DEG = 5


def _poly_features(r, v):
    """All monomials r^i v^j with i+j <= _POLY_DEG, as a trailing axis."""
    feats = []
    rp = [None] * (_POLY_DEG + 1)
    vp = [None] * (_POLY_DEG + 1)
    one = jnp.ones_like(r)
    rp[0] = one
    vp[0] = one
    for k in range(1, _POLY_DEG + 1):
        rp[k] = rp[k - 1] * r
        vp[k] = vp[k - 1] * v
    for i in range(_POLY_DEG + 1):
        for j in range(_POLY_DEG + 1 - i):
            feats.append(rp[i] * vp[j])
    return jnp.stack(feats, axis=-1)


def _fit_fg_poly():
    """Least-squares polynomial fit of the integrated FG LUT (scale, bias)
    over (roughness, ndotv) — a gather-free evaluation of the exact table
    (TPU LUT gathers are ~10ns/element; this is ~40 VPU flops). RMS error
    vs the table < 1%. Pure numpy: may be invoked inside a jit trace, where
    any jnp op would be staged as a tracer."""
    import numpy as np

    lut = np.asarray(_compute_fg_lut() if _FG_LUT is None else _FG_LUT)
    res = lut.shape[0]
    r = (np.arange(res) + 0.5) / res
    v = (np.arange(res) + 0.5) / res
    rr, vv = np.meshgrid(r, v, indexing="ij")
    rf, vf = rr.ravel(), vv.ravel()
    feats = [rf ** i * vf ** j
             for i in range(_POLY_DEG + 1)
             for j in range(_POLY_DEG + 1 - i)]
    feats = np.stack(feats, axis=-1)
    coef, *_ = np.linalg.lstsq(feats, lut.reshape(-1, 2), rcond=None)
    return coef.astype(np.float32)            # (n_feats, 2)


def env_brdf_approx(roughness, ndotv):
    """(scale, bias) of the split-sum env BRDF via the polynomial fit of the
    integrated table (see _fit_fg_poly)."""
    global _FG_POLY
    if _FG_POLY is None:
        _FG_POLY = _fit_fg_poly()
    from ..ops.smallvec import matmul_small

    c = jnp.asarray(_FG_POLY)
    feats = _poly_features(jnp.clip(roughness, 0.0, 1.0),
                           jnp.clip(ndotv, 0.0, 1.0))
    out = matmul_small(feats, c)
    return out[..., 0], out[..., 1]


def preintegrated_specular(f0, roughness, ndotv, use_lut: bool = False):
    """Split-sum specular reflectance E[f_spec] for (f0, roughness, ndotv) —
    used for energy compensation and for the deferred IBL/specular terms.
    Analytic by default (TPU-fast); use_lut=True keeps the integrated table
    (test oracle)."""
    if not use_lut:
        scale, bias = env_brdf_approx(roughness, ndotv)
        return f0 * scale[..., None] + bias[..., None]
    lut = fg_lut()
    ri = jnp.clip(roughness * _FG_RES - 0.5, 0, _FG_RES - 1)
    vi = jnp.clip(ndotv * _FG_RES - 0.5, 0, _FG_RES - 1)
    r0, v0 = jnp.floor(ri).astype(jnp.int32), jnp.floor(vi).astype(jnp.int32)
    r1, v1 = jnp.minimum(r0 + 1, _FG_RES - 1), jnp.minimum(v0 + 1, _FG_RES - 1)
    fr, fv = (ri - r0)[..., None], (vi - v0)[..., None]
    sb = (
        lut[r0, v0] * (1 - fr) * (1 - fv) + lut[r1, v0] * fr * (1 - fv)
        + lut[r0, v1] * (1 - fr) * fv + lut[r1, v1] * fr * fv
    )
    return f0 * sb[..., 0:1] + sb[..., 1:2]


# ----------------------------------------------------------------------------
# Layered BRDF (metalness workflow)
# ----------------------------------------------------------------------------

def derive_lobes(base_color, metallic):
    """albedo (diffuse) and F0 from metalness workflow."""
    albedo = base_color * (1.0 - metallic[..., None])
    f0 = 0.04 * (1.0 - metallic[..., None]) + base_color * metallic[..., None]
    return albedo, f0


def eval_layered(base_color, metallic, roughness, n, wo, wi):
    """Full layered BRDF value (RGB) for MIS/NEE. Zero below the horizon."""
    albedo, f0 = derive_lobes(base_color, metallic)
    ndotl = _dot(n, wi)
    ndotv = _dot(n, wo)
    spec, _ = specular_brdf(f0, roughness, n, wo, wi)
    # Energy compensation: boost single-scatter GGX by 1/E to conserve energy
    # at high roughness (the reference's multi-scatter compensation).
    e_ss = preintegrated_specular(f0, roughness, jnp.clip(ndotv, 1e-5, 1.0))
    spec = spec * (1.0 + f0 * (1.0 / jnp.clip(e_ss, 1e-3, 1.0) - 1.0))
    kd = (1.0 - f_schlick(f0, jnp.clip(ndotv, 0.0, 1.0)[..., None]))
    diff = albedo * kd / jnp.pi
    valid = ((ndotl > 0.0) & (ndotv > 0.0))[..., None]
    return jnp.where(valid, spec + diff, 0.0)


def pdf_layered(base_color, metallic, roughness, n, wo, wi):
    """Mixture pdf matching `sample_layered`'s lobe selection."""
    albedo, f0 = derive_lobes(base_color, metallic)
    p_spec = _lobe_spec_prob(albedo, f0)
    ndotl = jnp.clip(_dot(n, wi), 0.0, 1.0)
    _, pdf_s = specular_brdf(f0, roughness, n, wo, wi)
    pdf_d = ndotl / jnp.pi
    return p_spec * pdf_s + (1.0 - p_spec) * pdf_d


def _lobe_spec_prob(albedo, f0):
    ls = jnp.mean(f0, axis=-1)
    ld = jnp.mean(albedo, axis=-1)
    return jnp.clip(ls / jnp.maximum(ls + ld, 1e-6), 0.05, 0.95)


def sample_layered(base_color, metallic, roughness, n, wo, u_lobe, u1, u2):
    """Sample the layered BRDF. Returns (wi, pdf, brdf_value).
    Invalid samples (below horizon) get pdf 0."""
    albedo, f0 = derive_lobes(base_color, metallic)
    p_spec = _lobe_spec_prob(albedo, f0)
    wi_spec = sample_vndf(roughness, n, wo, u1, u2)
    from .sampling import cosine_hemisphere, to_world

    wi_diff = to_world(n, cosine_hemisphere(u1, u2))
    take_spec = (u_lobe < p_spec)[..., None]
    wi = jnp.where(take_spec, wi_spec, wi_diff)
    wi = wi * (1.0 / jnp.maximum(jnp.sqrt(jnp.maximum(_dot(wi, wi), 1e-24)), 1e-12))[..., None]
    pdf = pdf_layered(base_color, metallic, roughness, n, wo, wi)
    val = eval_layered(base_color, metallic, roughness, n, wo, wi)
    ok = _dot(n, wi) > 1e-5
    return wi, jnp.where(ok, pdf, 0.0), jnp.where(ok[..., None], val, 0.0)
