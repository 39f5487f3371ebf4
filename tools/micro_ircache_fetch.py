"""ircache lookup fetch strategies: serial gather vs bf16 one-hot MXU."""
import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from devbench import dev_ms

R = 518400          # half-res query count
T = 16384           # entries
CELLS = 131072      # 4 cascades x 32^3
C = 14

k = jax.random.split(jax.random.PRNGKey(0), 4)
lut = jax.random.normal(k[0], (T, C), jnp.float32)
grid = jax.random.randint(k[1], (CELLS,), -1, T, jnp.int32)
flat = jax.random.randint(k[2], (R,), 0, CELLS, jnp.int32)
se = jnp.maximum(grid[flat], 0)


def g_two(lut, grid, flat):
    se = jnp.maximum(grid.at[flat].get(mode="promise_in_bounds"), 0)
    return lut.at[se].get(mode="promise_in_bounds")


def g_lutcells(lut, grid, flat):
    cells = lut.at[jnp.maximum(grid, 0)].get(mode="promise_in_bounds")
    return cells.at[flat].get(mode="promise_in_bounds")


def g_onehot_bf16(lut, se):
    one = (jax.lax.broadcasted_iota(jnp.int32, (T, se.shape[0]), 0)
           == se[None, :]).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        lut.astype(jnp.bfloat16), one, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).T


def g_grid_gather(grid, flat):
    return grid.at[flat].get(mode="promise_in_bounds")


dev_ms(g_two, lut, grid, flat, label="two serial gathers")
dev_ms(g_lutcells, lut, grid, flat, label="lut_cells + one gather")
dev_ms(lambda l, s: g_onehot_bf16(l, s), lut, se, label="onehot bf16 (lut only)")
dev_ms(g_grid_gather, grid, flat, label="grid gather alone")

# correctness of onehot vs gather (bf16 value rounding expected)
a = jax.jit(g_onehot_bf16)(lut, se)
b = lut[se]
import numpy as np
rel = float((jnp.abs(a - b) / (jnp.abs(b) + 1e-3)).max())
print("onehot max rel err:", rel)
