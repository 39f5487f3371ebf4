"""Spatial blue-noise sampler for shadow/GI/AO decorrelation.

Role of the reference's blue-noise layer (`assets/shaders/inc/blue_noise.hlsl`,
LUT upload `default_world_renderer.rs:22-52`, consumers `renderers/rtr.rs:18-73`,
`trace_sun_shadow_mask.rgen.hlsl`): stochastic per-pixel decisions draw from a
tileable blue-noise mask instead of a white hash, pushing sample-placement
error into high spatial frequencies that the temporal/spatial denoisers kill
cheaply. Visibly less noise at equal spp.

TPU design: no texture units, so the mask is a plain (N, N) f32 array baked
at first use by void-and-cluster (Ulichney '93) with a toroidal gaussian
energy (FFT), cached under cache/. Per frame the mask is toroidally shifted
by an R2 low-discrepancy offset — exactly `blue_noise_for_pixel`'s
`(px + r2_sequence(n) * dims) % dims` — so every frame keeps the same blue
spectrum while frames decorrelate. A screen-sized plane is then a dynamic
roll of the small mask followed by `jnp.tile` + crop: no gathers, a few
microseconds of VPU work.

Independent streams use independently-baked masks (different seeds) for the
first few, then golden-ratio value rotation (ordered-dither trick: frac(bn +
k*phi) preserves the rank structure) beyond.
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from . import rng as rng_mod

BN_SIZE = 64
# One independently-baked mask per ACTIVE stream (shadows 0/1, rtdgi 2/3,
# rtr 4/5, ssao 6): value-rotated reuse of a base mask preserves its rank
# structure, so two passes sharing a base mask sample per-pixel correlated
# sequences — at equal spp that shows up as correlated artifacts across
# passes. 8 masks cover every current consumer with an independent bake.
_N_MASKS = 8
_PHI = 0.6180339887498949  # 1/golden ratio
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "cache")

# Lazy (N_MASKS, BN_SIZE, BN_SIZE) — cached as NUMPY, never as a jax array:
# the first call can happen inside a jit trace, where any jnp conversion is
# staged and caching it would leak a DynamicJaxprTracer into later traces.
_masks = None


def _gauss_fft(n: int, sigma: float = 1.9):
    x = np.arange(n)
    x = np.minimum(x, n - x).astype(np.float64)
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return np.fft.rfft2(np.outer(g, g))


def _void_and_cluster(n: int, seed: int) -> np.ndarray:
    """(n, n) float32 in (0, 1): rank/n^2 blue-noise mask, toroidal."""
    rng = np.random.default_rng(seed)
    total = n * n
    n_init = total // 10
    mask = np.zeros(total, bool)
    mask[rng.choice(total, n_init, replace=False)] = True
    kf = _gauss_fft(n)

    def energy(m):
        return np.fft.irfft2(np.fft.rfft2(m.reshape(n, n).astype(np.float64))
                             * kf, s=(n, n)).ravel()

    # phase 0: relax the prototype pattern (tightest cluster -> largest void)
    for _ in range(total):
        e = energy(mask)
        cluster = int(np.argmax(np.where(mask, e, -np.inf)))
        mask[cluster] = False
        void = int(np.argmin(np.where(mask, np.inf, energy(mask))))
        mask[void] = True
        if void == cluster:
            break

    rank = np.zeros(total, np.int64)
    m = mask.copy()                       # phase 1: peel, ranking downward
    for r in range(n_init - 1, -1, -1):
        e = energy(m)
        cluster = int(np.argmax(np.where(m, e, -np.inf)))
        m[cluster] = False
        rank[cluster] = r
    m = mask.copy()                       # phase 2: fill voids upward
    for r in range(n_init, total):
        void = int(np.argmin(np.where(m, np.inf, energy(m))))
        m[void] = True
        rank[void] = r
    return ((rank.astype(np.float32) + 0.5) / total).reshape(n, n)


def _load_masks():
    global _masks
    if _masks is not None:
        return _masks
    path = os.path.join(_CACHE, f"bluenoise{BN_SIZE}x{_N_MASKS}.npy")
    try:
        arr = np.load(path)
        assert arr.shape == (_N_MASKS, BN_SIZE, BN_SIZE)
    except Exception:
        arr = np.stack([_void_and_cluster(BN_SIZE, seed)
                        for seed in range(_N_MASKS)])
        try:
            os.makedirs(_CACHE, exist_ok=True)
            np.save(path, arr)
        except Exception:
            pass  # cache miss only costs re-bake next process
    _masks = np.ascontiguousarray(arr, np.float32)
    return _masks


def blue_noise_plane(h: int, w: int, frame_idx, stream: int = 0):
    """(h, w) f32 in (0, 1): blue-noise mask tiled over the screen, R2-shifted
    by frame. `stream` decorrelates independent consumers.

    KAJIYA_NO_BLUENOISE=1 swaps in the old white PCG hash — the A/B knob for
    equal-spp variance comparisons (tools/compare_bluenoise.py)."""
    if os.environ.get("KAJIYA_NO_BLUENOISE"):
        px = jnp.arange(h * w, dtype=jnp.uint32)
        r = rng_mod.pixel_rng(px % jnp.uint32(w), px // jnp.uint32(w),
                              jnp.asarray(frame_idx, jnp.uint32),
                              stream=101 + stream)
        return rng_mod.u01(r).reshape(h, w)
    masks = _load_masks()
    bn = jnp.asarray(masks[stream % _N_MASKS])   # per-call lift (see _masks)
    if stream >= _N_MASKS:
        # overflow streams: golden-ratio value rotation (keeps the blue
        # spectrum) PLUS a per-stream toroidal offset — the rotation alone
        # preserves rank structure, so without the shift two streams on the
        # same base mask stay per-pixel correlated.
        k = stream // _N_MASKS
        bn = jnp.mod(bn + _PHI * k, 1.0)
        bn = jnp.roll(bn, shift=(int((k * 23) % BN_SIZE),
                                 int((k * 41) % BN_SIZE)), axis=(0, 1))
    # toroidal shift by the frame's R2 offset (dynamic roll of the tile)
    off = rng_mod.r2_sequence(jnp.asarray(frame_idx, jnp.float32))
    oy = (off[0] * BN_SIZE).astype(jnp.int32)
    ox = (off[1] * BN_SIZE).astype(jnp.int32)
    bn = jnp.roll(bn, shift=(-oy, -ox), axis=(0, 1))
    ty = -(-h // BN_SIZE)
    tx = -(-w // BN_SIZE)
    return jnp.tile(bn, (ty, tx))[:h, :w]


def blue_noise_pair(h: int, w: int, frame_idx, stream: int = 0):
    """Two decorrelated (h, w) planes — the (u1, u2) of a 2D sample."""
    return (blue_noise_plane(h, w, frame_idx, stream=2 * stream),
            blue_noise_plane(h, w, frame_idx, stream=2 * stream + 1))
