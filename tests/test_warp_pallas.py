"""Pallas warp kernel vs the XLA gather sampler (local warps)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kajiya_tpu.core import img as im
from kajiya_tpu.ops.warp_pallas import warp2d_pallas

H, W = 128, 768


def _mk(seed, c=4):
    key = jax.random.PRNGKey(seed)
    img = jax.random.normal(key, (H, W, c))
    return img


def _uv_local(seed, scale=8.0):
    # bounded jitter (the kernel's locality contract): +-scale pixels
    key = jax.random.PRNGKey(seed + 7)
    base = im.pixel_uv(H, W)
    jitter = (jax.random.uniform(key, (H, W, 2)) * 2.0 - 1.0) * scale
    return base + jitter / jnp.asarray([W, H], jnp.float32)


@pytest.mark.parametrize("bilinear", [True, False])
def test_matches_xla_sampler(bilinear):
    img = _mk(0)
    uv = _uv_local(0)
    got = warp2d_pallas(img, uv, bilinear=bilinear, exact=True, interpret=True)
    ref = im.sample_bilinear(img, uv) if bilinear else im.sample_nearest(img, uv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_identity_uv_exact():
    img = _mk(1, c=2)
    uv = im.pixel_uv(H, W)
    got = warp2d_pallas(img, uv, bilinear=True, exact=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(img), atol=1e-5)


def test_single_channel_and_edge_clamp():
    img = _mk(2)[..., 0]
    # push uv outside [0,1]: clamp addressing must match the XLA sampler
    uv = im.pixel_uv(H, W) * 1.06 - 0.03
    got = warp2d_pallas(img, uv, bilinear=True, exact=True, interpret=True)
    ref = im.sample_bilinear(img, uv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_uniform_shift():
    img = _mk(3, c=3)
    uv = im.pixel_uv(H, W) + jnp.asarray([5.25 / W, -3.5 / H])
    got = warp2d_pallas(img, uv, bilinear=True, exact=True, interpret=True)
    ref = im.sample_bilinear(img, uv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fast_mode_close():
    img = _mk(5)
    uv = _uv_local(5)
    got = warp2d_pallas(img, uv, bilinear=True, exact=False, interpret=True)
    ref = im.sample_bilinear(img, uv)
    # bf16 single-pass: ~0.2% relative
    d = np.abs(np.asarray(got) - np.asarray(ref))
    assert d.max() < 0.05 * max(1.0, float(np.abs(np.asarray(ref)).max()))
