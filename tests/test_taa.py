"""TAA chain tests (reference: renderers/taa.rs:41-192 + shaders/taa/*).

Covers the round-3 'done' criteria: static-scene convergence (temporal
variance drops over frames), real coverage/validity behavior (disocclusion
resets accumulation), input-probability response to a lighting change, and
the temporal_upsampling super-res path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kajiya_tpu.core import img as im
from kajiya_tpu.renderers import taa

H, W = 48, 64


def _reproj_static(h, w):
    return {"prev_uv": im.pixel_uv(h, w),
            "validity": jnp.ones((h, w), jnp.float32),
            "in_bounds": jnp.ones((h, w), jnp.float32)}


def _scene(key):
    """A fixed 'rendered' image + depth; jitter simulated by shifting.
    Blurred to be piecewise smooth like a real render — per-pixel noise
    would give every pixel a huge neighborhood variance (wide clamp boxes),
    which no TAA clamps quickly."""
    img = jax.random.uniform(key, (H, W, 3), minval=0.05, maxval=1.0)
    for _ in range(3):
        img = im.separable_blur(img, im.GAUSS5)
    depth = jax.random.uniform(jax.random.PRNGKey(7), (H, W),
                               minval=0.2, maxval=0.8)
    for _ in range(3):
        depth = im.separable_blur(depth[..., None], im.GAUSS5)[..., 0]
    return img, depth


def _jittered(img, j):
    """The same scene rendered with sub-pixel jitter j: content appears
    shifted by -j (the camera samples at +j)."""
    return im.sample_const_offset(img, j[0], j[1])


JITTER = [jnp.array(j, jnp.float32) for j in
          [(0.0, 0.0), (0.375, -0.25), (-0.375, 0.125), (0.125, 0.375),
           (-0.25, -0.375), (0.25, 0.25), (-0.125, -0.125), (0.4, 0.1)]]


def test_static_scene_converges():
    """Accumulating a static jittered scene must reduce frame-to-frame
    variance: late-frame deltas << early-frame deltas."""
    img, depth = _scene(jax.random.PRNGKey(0))
    reproj = _reproj_static(H, W)
    st = taa.init_state(H, W)
    outs = []
    for i in range(8):
        j = JITTER[i % len(JITTER)]
        out, st = taa.taa(_jittered(img, j), st, reproj, depth, j, H, W)
        outs.append(np.asarray(out))
    d_early = np.abs(outs[1] - outs[0]).mean()
    d_late = np.abs(outs[7] - outs[6]).mean()
    assert d_late < 0.5 * d_early, (d_early, d_late)


def test_coverage_accumulates_and_caps():
    img, depth = _scene(jax.random.PRNGKey(1))
    reproj = _reproj_static(H, W)
    st = taa.init_state(H, W)
    covs = []
    for i in range(12):
        j = JITTER[i % len(JITTER)]
        _, st = taa.taa(_jittered(img, j), st, reproj, depth, j, H, W)
        covs.append(float(st["taa_coverage"].mean()))
    assert covs[3] > covs[0]
    # TARGET_SAMPLE_COUNT = 8 at same-res -> cap (taa.hlsl max_coverage)
    assert max(covs) <= 8.0 + 1e-4
    assert covs[-1] > 4.0


def test_disocclusion_resets_coverage():
    """Out-of-bounds reprojection must reset accumulation (history_valid
    branch of taa.hlsl), not blend stale history."""
    img, depth = _scene(jax.random.PRNGKey(2))
    st = taa.init_state(H, W)
    reproj = _reproj_static(H, W)
    for i in range(5):
        j = JITTER[i]
        _, st = taa.taa(_jittered(img, j), st, reproj, depth, j, H, W)
    # coverage = jitter-weighted effective sample count — grows sub-linearly
    assert float(st["taa_coverage"].mean()) > 2.0
    off = {"prev_uv": im.pixel_uv(H, W) + 2.0,  # everything off-screen
           "validity": jnp.zeros((H, W), jnp.float32),
           "in_bounds": jnp.zeros((H, W), jnp.float32)}
    out, st = taa.taa(_jittered(img, JITTER[0]), st, off, depth,
                      JITTER[0], H, W)
    # coverage restarts at ~1 sample
    assert float(st["taa_coverage"].mean()) < 1.5
    assert np.isfinite(np.asarray(out)).all()


def test_lighting_change_cuts_history():
    """A sudden 8x brightening must show up quickly in the output (the
    input-probability path expands the clamp box instead of ghosting)."""
    img, depth = _scene(jax.random.PRNGKey(3))
    reproj = _reproj_static(H, W)
    st = taa.init_state(H, W)
    for i in range(6):
        j = JITTER[i]
        _, st = taa.taa(_jittered(img, j), st, reproj, depth, j, H, W)
    bright = img * 8.0
    out = None
    for i in range(3):
        j = JITTER[(6 + i) % len(JITTER)]
        out, st = taa.taa(_jittered(bright, j), st, reproj, depth, j, H, W)
    # within 3 frames the output must be much closer to the new lighting
    err_new = np.abs(np.asarray(out) - np.asarray(bright)).mean()
    err_old = np.abs(np.asarray(out) - np.asarray(img)).mean()
    assert err_new < 0.5 * err_old, (err_new, err_old)


@pytest.mark.parametrize("scale", [1.5, 2.0])
def test_super_res(scale):
    """temporal_upsampling path: render res (H, W) -> output res scale x,
    output converges to a finite image with growing coverage."""
    img, depth = _scene(jax.random.PRNGKey(4))
    oh, ow = int(H * scale), int(W * scale)
    reproj = _reproj_static(H, W)
    st = taa.init_state(oh, ow)
    for i in range(6):
        j = JITTER[i]
        out, st = taa.taa(_jittered(img, j), st, reproj, depth, j, oh, ow)
    assert out.shape == (oh, ow, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert float(st["taa_coverage"].mean()) > 1.0
    # the upsampled output should resemble the input signal
    down = np.asarray(im.warp_nearest(out, im.pixel_uv(H, W)))
    err = np.abs(down - np.asarray(img)).mean()
    assert err < 0.12, err


def test_encode_decode_roundtrip():
    x = jax.random.uniform(jax.random.PRNGKey(5), (16, 16, 3)) * 4.0
    y = taa.encode_rgb(taa.decode_rgb(x))
    assert np.allclose(np.asarray(y), np.asarray(x), atol=1e-4)
