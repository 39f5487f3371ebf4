"""Image-space utilities shared by the screen-space passes.

Fills the role of the sampler objects + small helper kernels of the reference
(immutable sampler set `vulkan/device.rs:452-499`; half-res extraction kernels
`renderers/half_res.rs:4-44`). TPUs have no texture units, so sampling is
explicit gathers; everything below is static-shape, jit-friendly, and written
to keep gathers coalesced along the fast (width) axis.

Convention: images are (H, W) or (H, W, C) float32; uv has origin at the
top-left, v pointing down (matching the reference's screen convention).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather2d(img, iy, ix):
    """img[(iy, ix)] with clamped integer indices; iy/ix any equal shape.
    Rides the layout-pinned fast gather path (ops/gather.py::take_rows)."""
    from ..ops.gather import take_rows

    h, w = img.shape[0], img.shape[1]
    idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
    flat = img.reshape((h * w,) + img.shape[2:])
    return take_rows(flat, idx)


def sample_nearest(img, uv):
    """Nearest sample at uv in [0,1)^2. uv: (..., 2) -> (..., C)."""
    h, w = img.shape[0], img.shape[1]
    ix = jnp.floor(uv[..., 0] * w).astype(jnp.int32)
    iy = jnp.floor(uv[..., 1] * h).astype(jnp.int32)
    return _gather2d(img, iy, ix)


def sample_bilinear(img, uv):
    """Bilinear sample at uv in [0,1)^2 with clamp-to-edge addressing."""
    h, w = img.shape[0], img.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)
    fy = (y - y0)
    if img.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    c00 = _gather2d(img, y0i, x0i)
    c10 = _gather2d(img, y0i, x0i + 1)
    c01 = _gather2d(img, y0i + 1, x0i)
    c11 = _gather2d(img, y0i + 1, x0i + 1)
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def bilinear_weights_and_indices(img_hw, uv):
    """The four taps + weights of a bilinear footprint (for custom-weight
    filters like depth-aware reprojection). Returns (iy, ix, w) each (..., 4)."""
    h, w = img_hw
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    iy = jnp.stack([y0i, y0i, y0i + 1, y0i + 1], axis=-1)
    ix = jnp.stack([x0i, x0i + 1, x0i, x0i + 1], axis=-1)
    ww = jnp.stack(
        [(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy], axis=-1)
    return iy, ix, ww


def pixel_uv(h: int, w: int):
    """(H, W, 2) pixel-center uv lattice."""
    u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    v = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    return jnp.stack(jnp.broadcast_arrays(u[None, :], v[:, None]), axis=-1)


def warp_bilinear(img, uv, exact: bool = False,
                  window_rows: int = 48):
    """Bilinear sample for LOCAL warps (reprojection/temporal fetches,
    bounded-radius taps): rides the Pallas two-hot matmul kernel on TPU
    (ops/warp_pallas.py — XLA's serial gather path costs ~50 ms per 1080p
    bilinear), plain gathers elsewhere. Callers must satisfy the kernel's
    locality contract (intra-tile sample spread <= ~24 rows).

    Default precision is a single bf16 MXU pass (~2^-8 relative rounding:
    fine for radiance/history planes). Pass exact=True whenever the
    CHANNELS ARE COORDINATES (e.g. a warped prev_uv plane) — a 0.2% uv
    rounding is ~2 px of history-fetch error at 1080p."""
    from ..ops import warp_pallas as wp

    if wp.warp_supported(img, uv, window_rows):
        return wp.warp2d_pallas(img, uv, bilinear=True, exact=exact,
                                window_rows=window_rows)
    return sample_bilinear(img, uv)


def warp_nearest(img, uv, exact: bool = False,
                 window_rows: int = 48):
    """Nearest-sample twin of `warp_bilinear`.

    NOT bit-exact by default: values ride a single bf16 MXU pass (~2^-8
    relative rounding). That is fine for the packed reservoir planes,
    radiance history, and depth-for-validity payloads that ride this path
    (all compared against 5-30% thresholds downstream). Pass exact=True
    when the channels are COORDINATES (a warped uv plane) or anything
    where 0.2% relative error is user-visible — costs ~6x MXU time."""
    from ..ops import warp_pallas as wp

    if wp.warp_supported(img, uv, window_rows):
        return wp.warp2d_pallas(img, uv, bilinear=False, exact=exact,
                                window_rows=window_rows)
    return sample_nearest(img, uv)


def _avg2(n: int, dtype):
    """(n//2, n) two-hot 0.5-averaging matrix."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n // 2, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n // 2, n), 1)
    half = jnp.asarray(0.5, dtype)
    return ((c == 2 * r) | (c == 2 * r + 1)).astype(dtype) * half


def downsample_2x(img):
    """2x2 box reduce (the `half_res` extraction family, half_res.rs:4-44)
    as two-hot 0.5-averaging MXU matmuls — the (H/2, 2, W/2, 2) reshape it
    replaces relayouts T(8,128) tiles with stride-2 shuffles (~1-3.5 ms per
    1080p plane, see decimate2)."""
    h, w = img.shape[0] // 2 * 2, img.shape[1] // 2 * 2
    x = img[:h, :w]
    hp = jax.lax.Precision.HIGHEST
    dl = _avg2(h, x.dtype)
    dr = _avg2(w, x.dtype)
    if x.ndim == 2:
        return jax.lax.dot(dl, jax.lax.dot(x, dr.T, precision=hp),
                           precision=hp)
    t = jnp.einsum("hk,kwc->hwc", dl, x, precision=hp)
    return jnp.einsum("hwc,vw->hvc", t, dr, precision=hp)


def downsample_min(img):
    """2x2 min reduce: elementwise min over the four MXU phase extracts
    (min has no matmul form; four cheap extracts beat one phase relayout)."""
    a = phase_extract(img, 0, 0)
    b = phase_extract(img, 0, 1)
    c = phase_extract(img, 1, 0)
    d = phase_extract(img, 1, 1)
    return jnp.minimum(jnp.minimum(a, b), jnp.minimum(c, d))


def _sel2(n: int, dtype, off: int = 0):
    """(n//2, n) one-hot row-selection matrix: S[i, 2i + off] = 1."""
    import jax

    r = jax.lax.broadcasted_iota(jnp.int32, (n // 2, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n // 2, n), 1)
    return (c == 2 * r + off).astype(dtype)


def phase_extract(img, py: int, px: int):
    """img[py::2, px::2] via one-hot MXU matmuls (see decimate2 — measured
    13x over phase reshapes at 1080p; exact)."""
    import jax

    h, w = img.shape[0] // 2 * 2, img.shape[1] // 2 * 2
    x = img[:h, :w]
    hp = jax.lax.Precision.HIGHEST
    dl = _sel2(h, x.dtype, py)
    dr = _sel2(w, x.dtype, px)
    if x.ndim == 2:
        return jax.lax.dot(dl, jax.lax.dot(x, dr.T, precision=hp),
                           precision=hp)
    t = jnp.einsum("hk,kwc->hwc", dl, x, precision=hp)
    return jnp.einsum("hwc,vw->hvc", t, dr, precision=hp)




def decimate2(img):
    """img[::2, ::2] as one-hot selection matmuls on the MXU.

    Measured (device trace, v5e, 1080p): stride-2 slice 5.9 ms, reshape +
    unit slice 1.19 ms/plane (3.55 ms HW3) — phase reshapes relayout T(8,128)
    tiles with stride-2 shuffles — vs 0.09 ms/plane (0.22 HW3) for
    S_rows @ X @ S_cols^T. Exact: each output element is one input element,
    and precision=HIGHEST carries full f32 through the MXU passes.
    Non-float dtypes (bool masks) keep the reshape+slice path."""
    import jax

    h, w = img.shape[0] // 2 * 2, img.shape[1] // 2 * 2
    x = img[:h, :w]
    if not jnp.issubdtype(img.dtype, jnp.floating):
        x = x.reshape((h // 2, 2, w // 2, 2) + img.shape[2:])
        return x[:, 0, :, 0]
    hp = jax.lax.Precision.HIGHEST
    dl = _sel2(h, x.dtype)
    dr = _sel2(w, x.dtype)
    if x.ndim == 2:
        return jax.lax.dot(dl, jax.lax.dot(x, dr.T, precision=hp),
                           precision=hp)
    t = jnp.einsum("hk,kwc->hwc", dl, x, precision=hp)
    return jnp.einsum("hwc,vw->hvc", t, dr, precision=hp)


def downsample_nearest(img):
    """Take top-left texel of each 2x2 quad (matches half-res depth extract)."""
    return decimate2(img)


def upsample_bilinear(img, out_h: int, out_w: int):
    """Bilinear resize as SEPARABLE MATMULS: out_c = Wy @ img_c @ Wx^T with
    hat-function weight matrices built from iota (no embedded constants).
    Uniform resampling needs no gathers at all — the weight matrices are
    dense but tiny, and the MXU eats them. Exact 2x keeps the cheaper
    phase-weave path."""
    h, w = img.shape[0], img.shape[1]
    if out_h == h * 2 and out_w == w * 2:
        return upsample2x_bilinear(img)

    def weights(n_out, n_in):
        # row r samples input coordinate (r+0.5)*n_in/n_out - 0.5, clamped
        pos = ((jnp.arange(n_out, dtype=jnp.float32) + 0.5) * (n_in / n_out)
               - 0.5)
        pos = jnp.clip(pos, 0.0, n_in - 1.0)
        cols = jnp.arange(n_in, dtype=jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(cols[None, :] - pos[:, None]))

    wy = weights(out_h, h)                  # (H2, H)
    wx = weights(out_w, w)                  # (W2, W)
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    x = x.astype(jnp.float32)
    t = jnp.tensordot(wy, x, axes=[[1], [0]])            # (H2, W, C)
    out = jnp.tensordot(wx, t, axes=[[1], [1]])          # (W2, H2, C)
    out = out.transpose(1, 0, 2)
    return out[..., 0] if squeeze else out


def shift2d(img, dy: int, dx: int):
    """Shift with edge clamp (static offsets) — the building block of small
    stencil filters (a-trous, box). Pad + slice, NOT an iota gather: the
    gather form lowered to XLA's serial path (~3-4 ms per full-res tap on
    v5e); pad+slice is pure data movement that fuses into consumers, and
    edge-mode padding reproduces the index clamp exactly."""
    h, w = img.shape[0], img.shape[1]
    # |shift| >= dim degenerates to broadcasting the edge row/col, which the
    # clamped shift at dim-1 reproduces exactly
    dy = max(-(h - 1), min(h - 1, dy))
    dx = max(-(w - 1), min(w - 1, dx))
    pw = [(max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0))]
    if img.ndim == 3:
        pw = pw + [(0, 0)]
    y = jnp.pad(img, pw, mode="edge")
    return y[max(dy, 0):max(dy, 0) + h, max(dx, 0):max(dx, 0) + w]


def separable_blur(img, taps):
    """Separable odd-length blur with static weights (e.g. gaussian)."""
    r = len(taps) // 2
    w = jnp.asarray(taps, img.dtype).reshape((-1,) + (1,) * img.ndim)
    sx = shift_stack(img, [(0, i - r) for i in range(len(taps))])
    acc = jnp.sum(sx * w, axis=0)
    sy = shift_stack(acc, [(i - r, 0) for i in range(len(taps))])
    return jnp.sum(sy * w, axis=0)


GAUSS5 = (0.0625, 0.25, 0.375, 0.25, 0.0625)


# ----------------------------------------------------------------------------
# Gather-free regular-pattern sampling. XLA's TPU gather costs ~10ns/element;
# the renderer's most common "samples" are (a) whole-image constant sub-pixel
# shifts (TAA jitter compensation) and (b) exact 2x phase-aligned up/down
# sampling (half-res GI resolves). Both are static shifts + interleaves.
# ----------------------------------------------------------------------------

def sample_const_offset(img, dx_px, dy_px):
    """Bilinear sample of the whole image at a CONSTANT pixel offset in
    [-1, 1] (traced scalars ok). Gather-free: blends 3x3 static shifts with
    offset-derived weights."""
    fx = dx_px - jnp.floor(dx_px)
    fy = dy_px - jnp.floor(dy_px)
    # floor in {-1, 0} for offsets in [-1, 1]: select shifted planes
    neg_x = (jnp.floor(dx_px) < 0)
    neg_y = (jnp.floor(dy_px) < 0)

    def axis_blend(a, m1, z, p1, f, neg):
        lo = jnp.where(neg, m1, z)
        hi = jnp.where(neg, z, p1)
        return lo * (1 - f) + hi * f

    if img.ndim == 3:
        fx_b, fy_b = fx[..., None], fy[..., None]
    else:
        fx_b, fy_b = fx, fy
    # x axis
    xm1, x0, xp1 = shift2d(img, 0, -1), img, shift2d(img, 0, 1)
    row = axis_blend(img, xm1, x0, xp1, fx_b, neg_x)
    ym1, y0, yp1 = shift2d(row, -1, 0), row, shift2d(row, 1, 0)
    return axis_blend(row, ym1, y0, yp1, fy_b, neg_y)


def interleave_rows(a, b):
    """out[2i] = a[i], out[2i+1] = b[i]."""
    h, w = a.shape[0], a.shape[1]
    return jnp.stack([a, b], axis=1).reshape((2 * h, w) + a.shape[2:])


def interleave_cols(a, b):
    h, w = a.shape[0], a.shape[1]
    return jnp.stack([a, b], axis=2).reshape((h, 2 * w) + a.shape[2:])


def phase_split(x):
    """(H, W[, C]) -> nested [[p00, p01], [p10, p11]] half-res phase planes
    (p[py][px][i, j] = x[2i+py, 2j+px]) via one-hot MXU matmuls (see
    decimate2 — device-measured 13x over the phase reshape at 1080p; the
    (H/2, 2, W/2, 2) reshape relayouts T(8,128) tiles with stride-2
    shuffles)."""
    return [[phase_extract(x, py, px) for px in (0, 1)] for py in (0, 1)]


def weave2x2(ph):
    """Inverse of phase_split: 4 half-res phase planes -> (H, W[, C]) as
    one-hot MXU matmuls: out[2i+py, 2j+px] = ph[py][px][i, j]. Device-
    measured 6x over stack+reshape at 1080p (0.23 vs 1.46 ms/plane, 0.73 vs
    4.36 ms HW3). Exact — one-hot selection at HIGHEST precision."""
    import jax

    p00, p01 = ph[0][0], ph[0][1]
    p10, p11 = ph[1][0], ph[1][1]
    hh, hw = p00.shape[0], p00.shape[1]
    dt = p00.dtype
    hp = jax.lax.Precision.HIGHEST
    r0 = _sel2(2 * hh, dt, 0).T        # (2hh, hh): R[2i, i] = 1
    r1 = _sel2(2 * hh, dt, 1).T
    c0 = _sel2(2 * hw, dt, 0)          # (hw, 2hw): C[j, 2j] = 1
    c1 = _sel2(2 * hw, dt, 1)
    if p00.ndim == 2:
        m0 = jax.lax.dot(p00, c0, precision=hp) + jax.lax.dot(
            p01, c1, precision=hp)
        m1 = jax.lax.dot(p10, c0, precision=hp) + jax.lax.dot(
            p11, c1, precision=hp)
        return jax.lax.dot(r0, m0, precision=hp) + jax.lax.dot(
            r1, m1, precision=hp)
    m0 = (jnp.einsum("hwc,wv->hvc", p00, c0, precision=hp)
          + jnp.einsum("hwc,wv->hvc", p01, c1, precision=hp))
    m1 = (jnp.einsum("hwc,wv->hvc", p10, c0, precision=hp)
          + jnp.einsum("hwc,wv->hvc", p11, c1, precision=hp))
    return (jnp.einsum("gh,hwc->gwc", r0, m0, precision=hp)
            + jnp.einsum("gh,hwc->gwc", r1, m1, precision=hp))


def half_to_full_taps(half):
    """The four half-res taps of every full-res pixel's bilinear footprint
    under the standard pixel-center mapping (x_h = X/2 - 0.25), as FULL-RES
    images built by interleaving static shifts — the gather-free form of
    `bilinear_weights_and_indices` for an exact 2x upsample.

    Returns (taps, weights): 4 full-res arrays (2h, 2w, ...) and 4 scalar-
    pattern weight arrays (2h, 2w)."""
    hh, hw = half.shape[0], half.shape[1]

    def tap(ky, kx):
        # phase py: row tap = i + ky + py - 1
        rows = [shift2d(half, ky - 1 + py, 0) for py in (0, 1)]
        r = interleave_rows(rows[0], rows[1])
        cols = [shift2d(r, 0, kx - 1 + px) for px in (0, 1)]
        return interleave_cols(cols[0], cols[1])

    taps = [tap(0, 0), tap(0, 1), tap(1, 0), tap(1, 1)]

    wy0 = jnp.tile(jnp.asarray([0.25, 0.75], jnp.float32), hh)      # (2h,)
    wx0 = jnp.tile(jnp.asarray([0.25, 0.75], jnp.float32), hw)
    wy = [wy0[:, None], (1.0 - wy0)[:, None]]
    wx = [wx0[None, :], (1.0 - wx0)[None, :]]
    weights = [wy[0] * wx[0], wy[0] * wx[1], wy[1] * wx[0], wy[1] * wx[1]]
    weights = [jnp.broadcast_to(w, (2 * hh, 2 * hw)) for w in weights]
    return taps, weights


def upsample2x_bilinear(img):
    """Exact 2x bilinear upsample, gather-free: per-axis phase blend +
    interleave (bit-identical to the half_to_full_taps formulation, ~10x
    fewer traced ops)."""
    a = shift_stack(img, [(-1, 0), (0, 0), (1, 0)])
    r = interleave_rows(0.25 * a[0] + 0.75 * a[1], 0.75 * a[1] + 0.25 * a[2])
    b = shift_stack(r, [(0, -1), (0, 0), (0, 1)])
    return interleave_cols(0.25 * b[0] + 0.75 * b[1],
                           0.75 * b[1] + 0.25 * b[2])


def shift_stack(img, offsets):
    """All static shifts of `img` as ONE stacked tensor (N, H, W[, C]):
    one edge-pad + N slices of the padded array.

    This is the program-size workhorse: an unrolled k-tap stencil loop
    traces its body k times (k x the HLO instructions, k x the XLA compile
    time); stacking the taps on a leading axis lets the tap MATH be written
    once over (N, H, W) — same fused elementwise work at runtime, ~k x
    smaller program. Compile-time motivated redesign (round 4): the frame
    had grown to ~43k HLO equations, largely unrolled stencils."""
    h, w = img.shape[0], img.shape[1]
    my = max(max(-dy, dy, 0) for dy, _ in offsets)
    mx = max(max(-dx, dx, 0) for _, dx in offsets)
    my = min(my, h - 1)
    mx = min(mx, w - 1)
    pw = [(my, my), (mx, mx)] + [(0, 0)] * (img.ndim - 2)
    p = jnp.pad(img, pw, mode="edge")
    taps = []
    for dy, dx in offsets:
        dy = max(-(h - 1), min(h - 1, dy))
        dx = max(-(w - 1), min(w - 1, dx))
        taps.append(p[my + dy:my + dy + h, mx + dx:mx + dx + w])
    return jnp.stack(taps, axis=0)


OFF3X3 = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def local_moments_3x3(img):
    """Per-pixel mean and variance over the 3x3 neighborhood (single channel
    or per-channel); the workhorse of temporal variance clamps."""
    s = shift_stack(img, OFF3X3)
    m1 = s.mean(axis=0)
    m2 = (s * s).mean(axis=0)
    return m1, jnp.maximum(m2 - m1 * m1, 0.0)


def minmax_3x3(img):
    s = shift_stack(img, OFF3X3)
    return s.min(axis=0), s.max(axis=0)
