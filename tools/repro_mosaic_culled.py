"""Reproduce the Mosaic remote-compile failure of the culled streaming
kernel on the current libtpu (bench r4: 'tpu_compile_helper subprocess
exit code 1'), in isolation, with full stderr captured.

Run EXCLUSIVELY on the TPU: python tools/repro_mosaic_culled.py
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from kajiya_tpu.ops.woop_pallas import intersect_culled_pallas
    from kajiya_tpu.scene.procedural import random_tri_soup
    from kajiya_tpu.scene.scene import build_gpu_scene
    from kajiya_tpu.world import build_trace_scene

    gpu = build_gpu_scene(random_tri_soup(9000, seed=3))
    ts, levels = build_trace_scene(gpu)
    assert ts.woop is not None and ts.woop.get("cmin64") is not None
    rng = np.random.default_rng(0)
    R = 1 << 16
    org = jnp.asarray(rng.random((R, 3), np.float32) * 20 - 10)
    d = rng.standard_normal((R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)

    try:
        t, tri, u, v = jax.jit(
            lambda o, dd: intersect_culled_pallas(ts.woop, o, dd))(org, d)
        jax.block_until_ready(t)
        print("CULLED KERNEL OK:", int((np.asarray(tri) >= 0).sum()), "hits")
    except Exception:
        traceback.print_exc()
        print("\nCULLED KERNEL FAILED (see traceback)")


if __name__ == "__main__":
    main()
