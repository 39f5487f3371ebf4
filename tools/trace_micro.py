"""Device-trace-based microbenchmarks: the only honest timing on this
tunnel. Runs a set of candidate ops inside one traced block, then reports
per-op device durations from the xplane trace."""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
import numpy as np

H, W = 1080, 1920
R = H * W
key = jax.random.PRNGKey(0)

img1 = jax.random.normal(key, (H, W))
img4 = jax.random.normal(key, (H, W, 4))
img16 = jax.random.normal(key, (H, W, 16))
iy = jax.random.randint(key, (H, W), 0, H)
ix = jax.random.randint(key, (H, W), 0, W)
flat4 = img4.reshape(-1, 4)
fi = (iy * W + ix).reshape(-1)
small = jax.random.normal(key, (4096, 8))
sidx = jax.random.randint(key, (R,), 0, 4096)
uv = None

cases = {}
def case(name):
    def deco(f):
        cases[name] = f
        return f
    return deco

@case("g1d_2M")
def _(): return img1.reshape(-1)[fi]
@case("grow4_2M")
def _(): return flat4[fi]
@case("grow16_2M")
def _(): return img16.reshape(-1, 16)[fi]
@case("gsmall8_2M")
def _(): return small[sidx]
@case("onehot_small_2M")
def _():
    from kajiya_tpu.ops.smallvec import dot_pad_n
    import jax as _j
    def chunk(carry, ib):
        one = _j.nn.one_hot(ib, 4096, dtype=jnp.float32)
        return carry, dot_pad_n(one, small)
    sp = sidx[:2064384]
    _, out = _j.lax.scan(chunk, 0, sp.reshape(-1, 32768))
    return out
@case("rowgather_1080rows")
def _():
    ys = jax.random.randint(key, (H,), 0, H)
    return img4[ys]          # contiguous row gather
@case("take_along_x")
def _(): return jnp.take_along_axis(img1, ix, axis=1)
@case("bilinear4")
def _():
    from kajiya_tpu.core import img as im
    u = im.pixel_uv(H, W) + 0.003
    return im.sample_bilinear(img4, u)
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene
_gpu_sc = build_gpu_scene(cornell_box())
_ts, _lv = build_trace_scene(_gpu_sc)
_dirs = jax.random.normal(key, (R, 3))
_dirs = _dirs / jnp.linalg.norm(_dirs, axis=-1, keepdims=True)

@case("pallas_big")
def _():
    from kajiya_tpu.ops.woop_pallas import intersect_brute_pallas
    org = jnp.zeros((R, 3)) + jnp.asarray([0.0, 0.0, 2.4])
    return intersect_brute_pallas(_ts.woop, org, _dirs)[0]

names = sys.argv[1:] or list(cases)
from kajiya_tpu.ops.hoist import jit_hoisted
fns = {}
for n in names:
    f = jit_hoisted(lambda n=n: cases[n]())
    out = f()
    jax.block_until_ready(out)
    fns[n] = f
time.sleep(1)
with jax.profiler.trace("/tmp/jaxtrace_micro"):
    for n in names:
        out = fns[n]()
    jax.block_until_ready(out)
    time.sleep(3)
print("traced:", names, flush=True)
