"""Post-processing: blur pyramid, histogram exposure, glare, tone mapping.

Role of `renderers/post.rs:109-271` + `post_combine.hlsl` and the exposure
state machine in `world_renderer.rs:217-286`:
  * downsample blur pyramid -> 256-bin log-luminance histogram (GPU) with CPU
    readback for smoothed dynamic exposure;
  * reverse (upsample) blur pyramid = glare spread;
  * post_combine: glare composite, post-exposure multiply, contrast, display
    transform (tone map), sRGB encode.

TPU design: the histogram is a one-hot bincount (psum-able across a device
mesh — SURVEY.md section 2.8 names it the canonical collective); exposure
smoothing stays INSIDE the jitted frame as part of FrameState (no host
readback); the pyramid is a chain of 2x box reduces + gaussian taps.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import img as im
from ..core.color import luminance, srgb_encode

HIST_BINS = 256
EV_MIN, EV_MAX = -16.0, 16.0


# ----------------------------------------------------------------------------
# Luminance histogram + dynamic exposure
# ----------------------------------------------------------------------------

def luminance_histogram(rgb):
    """(HIST_BINS,) normalized log2-luminance histogram
    (post/luminance_histogram_calculate.hlsl).

    Dense formulation: cumulative counts via bin-edge comparisons, then a
    diff — scatter-add histograms fall into XLA-TPU's serial scatter path
    inside a big frame program (measured 18 ms at 1080p; this is <1 ms).
    Metering runs on an 8x8-subsampled image (~32k samples at 1080p): the
    dense compare is O(BINS * samples), and exposure metering needs no
    more resolution than a coarse mip (the reference meters its blur
    pyramid's reduced mip, post.rs:112-130)."""
    small = im.decimate2(im.decimate2(im.decimate2(rgb)))
    lum = jnp.maximum(luminance(small), 1e-8)
    ev = jnp.clip(jnp.log2(lum), EV_MIN, EV_MAX).reshape(-1)
    edges = jnp.linspace(EV_MIN, EV_MAX, HIST_BINS + 1)[1:]  # upper edges
    scale = (HIST_BINS - 1) / (EV_MAX - EV_MIN)
    q = (ev - EV_MIN) * scale                         # bin coordinate
    cum = jnp.sum(q[None, :] < jnp.arange(1, HIST_BINS + 1,
                                          dtype=jnp.float32)[:, None],
                  axis=1).astype(jnp.float32)
    hist = jnp.diff(cum, prepend=0.0)
    del edges
    return hist / jnp.maximum(jnp.sum(hist), 1.0)


def exposure_from_histogram(hist, low_frac=0.6, high_frac=0.95,
                            ev_shift: float = 0.0):
    """Mean EV of the [low, high] percentile band -> target exposure
    multiplier (the reference's histogram metering, `post.rs:184-231`).

    Each bin is weighted by the overlap of its CDF span with the percentile
    band (the reference clips partial bins the same way) — so a single bin
    jumping across the whole band still meters correctly instead of
    collapsing to an empty selection."""
    cdf = jnp.cumsum(hist)
    cdf_lo = jnp.concatenate([jnp.zeros((1,), hist.dtype), cdf[:-1]])
    centers = jnp.linspace(EV_MIN, EV_MAX, HIST_BINS)
    overlap = jnp.maximum(
        jnp.minimum(cdf, high_frac) - jnp.maximum(cdf_lo, low_frac), 0.0)
    w = jnp.maximum(jnp.sum(overlap), 1e-6)
    mean_ev = jnp.sum(overlap * centers) / w
    # map scene EV to a target such that mean maps to middle grey-ish
    return -mean_ev + ev_shift


def init_exposure_state(ev_shift: float = 0.0):
    # pre_mult: the reference's pre-exposure split (world_renderer.rs:265-286)
    # — the part of the exposure applied BEFORE the temporal stack so history
    # clamps, variance estimates and the bf16 glare pyramid operate in a
    # stable mid-grey range; post_combine applies only the remainder.
    return {"smoothed_ev": jnp.asarray(0.0, jnp.float32),
            "pre_mult": jnp.asarray(1.0, jnp.float32)}


def update_exposure(state, lit, dt: float = 1.0 / 60.0, speed: float = 2.5,
                    ev_shift: float = 0.0):
    """Smoothed dynamic exposure (world_renderer.rs:919-948). Returns
    (exposure_multiplier, new_state)."""
    hist = luminance_histogram(lit)
    target = exposure_from_histogram(hist, ev_shift=ev_shift)
    t = 1.0 - jnp.exp(-speed * dt)
    ev = state["smoothed_ev"] + (target - state["smoothed_ev"]) * t
    return jnp.exp2(ev), {"smoothed_ev": ev}


# ----------------------------------------------------------------------------
# Glare pyramid
# ----------------------------------------------------------------------------

def glare_pyramid(lit, levels: int = 6):
    """Downsample chain with gaussian prefilter, then reverse accumulate —
    the `_blurN` / `_rev_blurN` pyramid pair (post.rs:24-108).

    Runs in bfloat16: the pyramid is pure data movement (its relayout
    copies were ~8 ms of the post pass at 1080p f32) and glare is a 7%
    blend of a heavily blurred image — 2^-8 rounding is invisible."""
    x = lit.astype(jnp.bfloat16)
    mips = [x]
    for _ in range(levels):
        if min(x.shape[0], x.shape[1]) < 4:
            break
        x = im.downsample_2x(_blur3(x))
        mips.append(x)
    # reverse: upsample and accumulate downward with equal weights
    acc = mips[-1]
    for m in reversed(mips[:-1]):
        acc = _blur3(im.upsample_bilinear(acc, m.shape[0], m.shape[1])
                     .astype(jnp.bfloat16)) * 0.6 + m * 0.4
    return acc.astype(jnp.float32)


def _blur3(img):
    return im.separable_blur(img, (0.25, 0.5, 0.25))


# ----------------------------------------------------------------------------
# Display transform
# ----------------------------------------------------------------------------

# Oklab (Björn Ottosson's published matrices) — the perceptual space for
# the hue-preserving path-to-white (the reference selects IPT/Oklab/ICtCp;
# `display_transform.hlsl:30-31`)
_OKLAB_M1 = jnp.array([[0.4122214708, 0.5363325363, 0.0514459929],
                       [0.2119034982, 0.6806995451, 0.1073969566],
                       [0.0883024619, 0.2817188376, 0.6299787005]])
_OKLAB_M2 = jnp.array([[0.2104542553, 0.7936177850, -0.0040720468],
                       [1.9779984951, -2.4285922050, 0.4505937099],
                       [0.0259040371, 0.7827717662, -0.8086757660]])


import numpy as _np

_OKLAB_M2_INV = jnp.asarray(_np.linalg.inv(_np.asarray(_OKLAB_M2)))
_OKLAB_M1_INV = jnp.asarray(_np.linalg.inv(_np.asarray(_OKLAB_M1)))


def _srgb_to_oklab(rgb):
    from ..ops.smallvec import matvec

    lms = jnp.cbrt(matvec(_OKLAB_M1, jnp.maximum(rgb, 0.0)))
    return matvec(_OKLAB_M2, lms)


def _oklab_to_srgb(lab):
    from ..ops.smallvec import matvec

    lms = matvec(_OKLAB_M2_INV, lab) ** 3
    return matvec(_OKLAB_M1_INV, lms)


def tonemap_filmic(x):
    """Display transform following the notorious6 structure
    (`inc/color/display_transform.hlsl:67-218`, synced by the reference
    from the notorious6 project):

      1. brightness compressed with the Siragusano/Smith flare-compensated
         Reinhard `1.0205 * (v / (v + 1))^1.2` (open-display-transform
         tonescale);
      2. chromaticity preserved: the max-intensity stimulus of the same
         chromaticity is scaled to the compressed luminance;
      3. progressive highlight desaturation ("path to white") traced in
         Oklab so hue holds under the Abney effect, with the chroma
         attenuation exponent lerped 4 -> 3 by chroma strength
         (CHROMA_ATTENUATION_* constants);
      4. a per-channel p=12 soft roll-off absorbs residual out-of-gamut
         energy, rescaled so neutrals still reach 100% white.

    Simplifications vs the reference: plain luminance instead of the
    Helmholtz-Kohlrausch equivalent luminance, and single-pass (no
    brightness-matching iteration)."""
    from ..core.color import luminance

    eps = 1e-8
    lum = jnp.maximum(luminance(x), 0.0)
    peak = jnp.maximum(jnp.max(x, axis=-1), eps)
    max_rgb = jnp.maximum(x, 0.0) / peak[..., None]
    max_lum = jnp.maximum(luminance(max_rgb), eps)

    # 1. Siragusano/Smith tonescale on luminance
    compressed = jnp.clip(1.0205 * (lum / (lum + 1.0)) ** 1.2, 0.0, 1.0)

    # 2. chromatic stimulus scaled to the compressed brightness
    out = max_rgb * (compressed / max_lum)[..., None]
    white = jnp.minimum(compressed, 1.0)

    # 3. chroma attenuation toward white, traced in Oklab
    #    (START=0, BIAS=1.03, exponent in [3,4] by chroma strength)
    sat = jnp.max(max_rgb, axis=-1) - jnp.min(max_rgb, axis=-1)
    expo = 4.0 - sat * 0.4 * (4.0 - 3.0)
    t = jnp.clip(compressed / 1.03, 0.0, 1.0)
    atten = t ** expo
    lab = _srgb_to_oklab(out)
    lab_w = _srgb_to_oklab(jnp.repeat(white[..., None], 3, -1))
    out = _oklab_to_srgb(lab + (lab_w - lab) * atten[..., None])

    # 4. per-channel soft roll-off (p=12) + neutral-reach rescale
    out = jnp.maximum(out, 0.0)
    p = 12.0
    out = out * (out ** p + 1.0) ** (-1.0 / p)
    max_c = jnp.max(out, axis=-1)
    max_dist = max_c - jnp.min(out, axis=-1)
    out = out / ((0.5 + 0.5 * max_dist) ** (1.0 / p))[..., None]
    return jnp.clip(out, 0.0, 1.0)


def cas_sharpen(img, amount: float = 0.4):
    """Contrast-adaptive sharpening (AMD FidelityFX CAS flavor): sharpening
    strength falls off where local contrast is already high. Applied on the
    tonemapped image like the reference (README 'CAS')."""
    mn = img
    mx = img
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        v = im.shift2d(img, dy, dx)
        mn = jnp.minimum(mn, v)
        mx = jnp.maximum(mx, v)
    # amount of allowed sharpening per pixel
    d_mn = mn
    d_mx = 1.0 - mx
    a = jnp.sqrt(jnp.clip(jnp.minimum(d_mn, d_mx) /
                          jnp.maximum(mx, 1e-4), 0.0, 1.0))
    w = -a * (amount * 0.2)
    cross = (im.shift2d(img, -1, 0) + im.shift2d(img, 1, 0)
             + im.shift2d(img, 0, -1) + im.shift2d(img, 0, 1))
    out = (img + cross * w) / jnp.maximum(1.0 + 4.0 * w, 1e-4)
    return jnp.clip(out, 0.0, 1.0)


# --- Bezold-Brucke hue shift ------------------------------------------------
# Pridmore (1999) measured wavelength-shift data for the 10:100 cd/m^2
# luminance ratio, exactly the dataset behind the reference's baked LUT
# (`inc/color/bezold_brucke.hlsl:66-93`, `lut/bezold_brucke.hlsl`). The
# piecewise-linear curve (hue-coordinate t -> shift in nm) is Fourier-fit at
# import so runtime evaluation is a short cos/sin series — gather-free VPU
# math instead of a LUT fetch (the TPU-native form of `lut_renderers.rs`).
_PRIDMORE_T_NM = _np.array([
    [0.0, 0.0], [0.084, -5.0], [0.152, -5.0], [0.2055, -4.0], [0.25, 0.0],
    [0.265, 2.3], [0.291, 5.0], [0.31, 6.0], [0.3285, 6.5], [0.356, 5.4],
    [0.395, 4.4], [0.4445, 3.93], [0.551, -4.9], [0.585, -6.0],
    [0.6065, -6.0], [0.6133, -3.0], [0.621, 1.42], [0.6245, 1.9],
    [0.633, 2.55], [0.92495, 2.55], [0.92525, 3.35], [0.9267, 4.8],
    [0.93, 6.15], [0.934, 7.0], [0.942, 5.95], [0.956, 4.0]])


def _fit_bb_fourier(n_harm: int = 10, n_pts: int = 512):
    ts = _np.linspace(0.0, 1.0, n_pts, endpoint=False)
    xp = _np.concatenate([_PRIDMORE_T_NM[:, 0],
                          [_PRIDMORE_T_NM[0, 0] + 1.0]])
    fp = _np.concatenate([_PRIDMORE_T_NM[:, 1], [_PRIDMORE_T_NM[0, 1]]])
    vals = _np.interp(ts, xp, fp)
    cols = [_np.ones_like(ts)]
    for k in range(1, n_harm + 1):
        cols.append(_np.cos(2 * _np.pi * k * ts))
        cols.append(_np.sin(2 * _np.pi * k * ts))
    coef, *_ = _np.linalg.lstsq(_np.stack(cols, -1), vals, rcond=None)
    return jnp.asarray(coef), n_harm


_BB_COEF, _BB_HARM = _fit_bb_fourier()

# sRGB <-> XYZ (D65), row-major
_RGB2XYZ = jnp.asarray([[0.4124564, 0.3575761, 0.1804375],
                        [0.2126729, 0.7151522, 0.0721750],
                        [0.0193339, 0.1191920, 0.9503041]])
_XYZ2RGB = jnp.asarray(_np.linalg.inv(_np.array(
    [[0.4124564, 0.3575761, 0.1804375],
     [0.2126729, 0.7151522, 0.0721750],
     [0.0193339, 0.1191920, 0.9503041]])))
_D65_XY = (0.31272, 0.32903)
_BB_RAD_PER_NM = 0.02     # mean d(hue angle)/d(wavelength) around D65


def bezold_brucke_shift(rgb, amount):
    """Bezold-Brucke hue shift (`bezold_brucke_shift_XYZ_*`): as stimuli get
    brighter, perceived hue drifts — the shift is a dominant-wavelength
    displacement whose sign/magnitude follows Pridmore's measurements. The
    chromaticity offset from D65 is rotated by the (Fourier-evaluated)
    nm-shift scaled to hue angle; saturation and luminance are preserved,
    matching the reference's constant-|offset| LUT application.

    amount: (H, W) or scalar in [0, 1) — the reference ramps it as
    lum / (lum + BEZOLD_BRUCKE_SHIFT_RAMP) on the pre-display stimulus."""
    from ..ops.smallvec import matvec

    xyz = matvec(_RGB2XYZ, jnp.maximum(rgb, 0.0))
    s = jnp.maximum(xyz.sum(-1), 1e-8)
    x = xyz[..., 0] / s
    y = xyz[..., 1] / s
    ox = x - _D65_XY[0]
    oy = y - _D65_XY[1]
    theta = jnp.arctan2(oy, ox)
    t = ((-theta / jnp.pi) * 0.5 + 0.61) % 1.0
    ks = jnp.arange(1, _BB_HARM + 1, dtype=jnp.float32)
    ang = 2 * jnp.pi * t[..., None] * ks                  # (..., HARM)
    nm = (_BB_COEF[0]
          + jnp.sum(_BB_COEF[1::2] * jnp.cos(ang)
                    + _BB_COEF[2::2] * jnp.sin(ang), axis=-1))
    delta = nm * _BB_RAD_PER_NM * amount
    c, sn = jnp.cos(delta), jnp.sin(delta)
    nx = _D65_XY[0] + ox * c - oy * sn
    ny = _D65_XY[1] + ox * sn + oy * c
    ny_safe = jnp.maximum(ny, 1e-6)
    Y = xyz[..., 1]
    out = jnp.stack([nx * Y / ny_safe, Y,
                     (1.0 - nx - ny) * Y / ny_safe], axis=-1)
    return jnp.maximum(matvec(_XYZ2RGB, out), 0.0)


def post_combine(lit, exposure_mult, glare_amount: float = 0.07,
                 contrast: float = 1.03, glare=None):
    """Final combine (post_combine.hlsl): glare blend, exposure, contrast,
    tone map, sRGB. Returns display-ready (H, W, 3) in [0,1]."""
    if glare is None:
        glare = glare_pyramid(lit)
    from ..core.color import luminance

    x = lit * (1.0 - glare_amount) + glare * glare_amount
    x = x * exposure_mult
    # B-B hue shift on the linear pre-display stimulus, ramped by
    # luminance as in `display_transform.hlsl:84-85` (SHIFT_RAMP = 5)
    lum = luminance(x)
    x = bezold_brucke_shift(x, lum / (lum + 5.0))
    t = tonemap_filmic(x)
    # contrast in log space around mid grey
    t = jnp.clip(0.18 * jnp.power(jnp.maximum(t, 1e-6) / 0.18, contrast), 0.0, 1.0)
    t = cas_sharpen(t)
    return srgb_encode(t)
