"""tile_shift: per-(8,128)-tile quantized offset fetch (spatial ReSTIR taps).

The TPU Pallas kernel and the XLA fallback are bit-identical by
construction; these tests pin down the XLA semantics (edge clamping via
padding, offset clamps, shapes) that the kernel mirrors. test_warp_pallas.py
is the model for the on-TPU equivalence check (interpret mode can't express
the dynamic rolls, so the kernel itself is validated on hardware by
tools/micro_ts3.py and by the frame-level oracle)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kajiya_tpu.ops import tileshift_pallas as tsp


def _naive(img, dy, dx):
    """Per-pixel quantized fetch with per-pixel edge clamp."""
    h, w = img.shape[:2]
    nty, ntx = tsp.tile_grid(h, w)
    out = np.empty_like(img)
    for y in range(h):
        for x in range(w):
            t = (y // tsp.TH) * ntx + (x // tsp.TW)
            sy = min(max(y + int(dy[t]), 0), h - 1)
            sx = min(max(x + int(dx[t]), 0), w - 1)
            out[y, x] = img[sy, sx]
    return out


class TestTileShift:
    def test_matches_naive_clamped_fetch(self):
        k = jax.random.PRNGKey(0)
        img = np.asarray(jax.random.normal(k, (48, 300, 3)))
        nty, ntx = tsp.tile_grid(48, 300)
        rs = np.random.RandomState(1)
        dy = rs.randint(-9, 10, nty * ntx).astype(np.int32)
        dx = rs.randint(-9, 10, nty * ntx).astype(np.int32)
        out = np.asarray(tsp.tile_shift(jnp.asarray(img), dy, dx))
        ref = _naive(img, dy, dx)
        assert np.array_equal(out, ref)

    def test_zero_offset_is_identity(self):
        img = jax.random.normal(jax.random.PRNGKey(2), (40, 256, 5))
        nty, ntx = tsp.tile_grid(40, 256)
        z = jnp.zeros(nty * ntx, jnp.int32)
        out = tsp.tile_shift(img, z, z)
        assert jnp.array_equal(out, img)

    def test_offsets_clamped_to_window(self):
        img = jax.random.normal(jax.random.PRNGKey(3), (32, 256))
        nty, ntx = tsp.tile_grid(32, 256)
        big = jnp.full(nty * ntx, 10_000, jnp.int32)
        out = tsp.tile_shift(img, big, big)           # clamps to (16, 64)
        ref = tsp.tile_shift(img, jnp.full_like(big, tsp.MAX_DY),
                             jnp.full_like(big, tsp.MAX_DX))
        assert jnp.array_equal(out, ref)

    def test_2d_squeeze(self):
        img = jax.random.normal(jax.random.PRNGKey(4), (24, 140))
        nty, ntx = tsp.tile_grid(24, 140)
        z = jnp.zeros(nty * ntx, jnp.int32)
        assert tsp.tile_shift(img, z, z).shape == (24, 140)
