import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

def k_take(tab_ref, idx_ref, out_ref):
    out_ref[:, :] = jnp.take(tab_ref[:, :], idx_ref[0, :], axis=0)

def k_adv(tab_ref, idx_ref, out_ref):
    out_ref[:, :] = tab_ref[idx_ref[0, :], :]

def k_taa(tab_ref, idx_ref, out_ref):
    # take_along_axis style: per-lane gather along sublanes
    t = tab_ref[:, :]            # (T, 128)
    i = idx_ref[:, :]            # (8, 128)
    out_ref[:, :] = jnp.take_along_axis(t, i, axis=0)[:8, :]

T, N = 512, 1024
tab = jnp.arange(T * 128, dtype=jnp.float32).reshape(T, 128)
idx = jax.random.randint(jax.random.PRNGKey(0), (1, N), 0, T)
idx8 = jax.random.randint(jax.random.PRNGKey(0), (8, 128), 0, T)

for name, kern, idxarg, outshape in [
    ("take", k_take, idx, (N, 128)),
    ("advidx", k_adv, idx, (N, 128)),
    ("take_along", k_taa, idx8, (8, 128)),
]:
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(outshape, jnp.float32),
        )(tab, idxarg if name != "take_along" else idx8)
        jax.block_until_ready(out)
        ref = np.asarray(tab)[np.asarray(idxarg if name != "take_along" else idx8).reshape(-1)[:outshape[0]]] if name != "take_along" else None
        print(f"{name}: OK shape={out.shape}", flush=True)
        if name == "advidx":
            expect = np.asarray(tab)[np.asarray(idx)[0]]
            print("  correct:", np.allclose(np.asarray(out), expect), flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
