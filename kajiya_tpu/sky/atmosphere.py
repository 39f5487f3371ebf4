"""Procedural atmosphere: single-scattering Rayleigh + Mie ray march.

Fills the role of the reference's sky pass (`renderers/sky.rs`,
`assets/shaders/inc/atmosphere.hlsl` — Felix Westin's MinimalAtmosphere):
a physically-plausible analytic daylight sky evaluated per direction, cheap
enough to rebuild a small cube map every frame. This implementation is a
standard Nishita-style single-scatter march written for the VPU: fixed step
counts (static shapes), fully elementwise, no lookup tables.

The sun DISK is deliberately excluded from `sky_radiance`; direct sun is
handled by NEE everywhere (so there is no double counting), matching the
role split in the reference (sun via `sun.hlsl` + shadow rays).
"""
from __future__ import annotations

import jax.numpy as jnp

EARTH_RADIUS = 6_360e3
ATMO_RADIUS = 6_420e3
H_RAYLEIGH = 8_500.0
H_MIE = 1_200.0
BETA_RAYLEIGH = jnp.array([5.802e-6, 13.558e-6, 33.1e-6])
BETA_MIE = jnp.array([3.996e-6, 3.996e-6, 3.996e-6])
BETA_MIE_ABS = jnp.array([4.4e-6, 4.4e-6, 4.4e-6])
MIE_G = 0.8
SUN_INTENSITY = 20.0  # matches the reference's default sun scale


def _ray_sphere_exit(origin_h, mu):
    """Distance to atmosphere top for a ray from height origin_h (from planet
    center) with cos(zenith) = mu. Assumes origin inside the atmosphere."""
    r = origin_h
    b = r * mu
    c = r * r - ATMO_RADIUS * ATMO_RADIUS
    disc = jnp.maximum(b * b - c, 0.0)
    return -b + jnp.sqrt(disc)


def _densities(h):
    h = jnp.maximum(h, 0.0)
    return jnp.exp(-h / H_RAYLEIGH), jnp.exp(-h / H_MIE)


def _phase_rayleigh(c):
    return 3.0 / (16.0 * jnp.pi) * (1.0 + c * c)


def _phase_mie(c, g=MIE_G):
    g2 = g * g
    return (3.0 / (8.0 * jnp.pi)) * ((1.0 - g2) * (1.0 + c * c)) / (
        (2.0 + g2) * jnp.power(1.0 + g2 - 2.0 * g * c, 1.5))


def _optical_depth_to_sun(pos_r, pos_y, mu_s, steps: int = 4):
    """Approximate optical depth along the sun direction from a point at
    radius pos_r (pos_y = height over ground). Short fixed march."""
    dist = _ray_sphere_exit(pos_r, mu_s)
    ds = dist / steps
    t = (jnp.arange(steps) + 0.5) * ds[..., None]
    h = jnp.sqrt(jnp.maximum(
        pos_r[..., None] ** 2 + t * t + 2.0 * pos_r[..., None] * t * mu_s[..., None], 1.0)
    ) - EARTH_RADIUS
    dr, dm = _densities(h)
    return (dr * ds[..., None]).sum(-1), (dm * ds[..., None]).sum(-1)


def sky_radiance(direction, sun_direction, altitude: float = 200.0, steps: int = 12):
    """In-scattered sky radiance (RGB) for unit view directions.

    direction: (..., 3); sun_direction: (3,) unit, towards the sun.
    Returns (..., 3) linear radiance. Sun disk NOT included.
    """
    d = direction
    r0 = EARTH_RADIUS + altitude
    mu = jnp.clip(d[..., 1], -1.0, 1.0)
    # clamp rays below the horizon to skim the ground haze
    dist = _ray_sphere_exit(jnp.full_like(mu, r0), jnp.maximum(mu, -0.03))
    ds = dist / steps

    from ..ops.smallvec import dot3
    cos_sun = dot3(d, sun_direction)
    ph_r = _phase_rayleigh(cos_sun)[..., None]
    ph_m = _phase_mie(cos_sun)[..., None]
    mu_s = sun_direction[1]

    # fori_loop, not an unrolled Python loop: the march is traced once per
    # call site, and the frame has several call sites (env build, background,
    # per-wavefront miss shading) — unrolling was ~500 HLO eqns per site
    import jax

    def step_body(i, carry):
        accum_r, accum_m, od_r, od_m = carry
        t = (i.astype(jnp.float32) + 0.5) * ds
        r = jnp.sqrt(jnp.maximum(r0 * r0 + t * t + 2.0 * r0 * t * mu, 1.0))
        h = r - EARTH_RADIUS
        dr, dm = _densities(h)
        od_r = od_r + dr * ds
        od_m = od_m + dm * ds
        # sun transmittance from the sample point
        sr, sm = _optical_depth_to_sun(r, h, jnp.broadcast_to(mu_s, r.shape))
        tau = (
            BETA_RAYLEIGH * (od_r + sr)[..., None]
            + (BETA_MIE + BETA_MIE_ABS) * (od_m + sm)[..., None]
        )
        trans = jnp.exp(-tau)
        accum_r = accum_r + trans * (dr * ds)[..., None]
        accum_m = accum_m + trans * (dm * ds)[..., None]
        return accum_r, accum_m, od_r, od_m

    accum_r, accum_m, od_r, od_m = jax.lax.fori_loop(
        0, steps, step_body,
        (jnp.zeros(d.shape[:-1] + (3,)), jnp.zeros(d.shape[:-1] + (3,)),
         jnp.zeros(d.shape[:-1]), jnp.zeros(d.shape[:-1])))

    radiance = SUN_INTENSITY * (accum_r * BETA_RAYLEIGH * ph_r + accum_m * BETA_MIE * ph_m)
    # fade everything below the horizon to a dark ground
    below = jnp.clip(-mu * 20.0, 0.0, 1.0)[..., None]
    return radiance * (1.0 - 0.9 * below)


def atmosphere_sun_transmittance(sun_direction, altitude: float = 200.0):
    """Transmittance of direct sunlight to the ground (tints the sun at dusk)."""
    r0 = EARTH_RADIUS + altitude
    mu_s = jnp.clip(sun_direction[..., 1], -1.0, 1.0)
    sr, sm = _optical_depth_to_sun(jnp.asarray(r0), jnp.asarray(0.0), mu_s, steps=8)
    tau = BETA_RAYLEIGH * sr[..., None] + (BETA_MIE + BETA_MIE_ABS) * sm[..., None]
    return jnp.exp(-tau) * jnp.clip(mu_s * 10.0 + 0.1, 0.0, 1.0)
