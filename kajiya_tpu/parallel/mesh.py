"""Device-mesh sharding of the renderer.

Parallel axes (the renderer's analog of dp/tp/sp — SURVEY.md section 2.8):

  * ``tile``  — data-parallel over pixels: every (H, W, ...) frame plane is
    sharded along H (screen rows = tiles). Scene tables, BVH, and view
    constants are replicated; BVH gathers read replicated operands so no
    collectives appear in traversal. Screen-space filters read neighbor rows
    -> XLA inserts halo exchanges (collective-permute) on ICI automatically.
  * ``spp`` (sample-parallel, `shard_rays_pt`) — data-parallel over rays of
    the reference path tracer: shard the flat ray batch, trace independently,
    no communication until the caller's accumulate.
  * Reductions that cross tiles (luminance histogram -> exposure) become
    psum-style all-reduces, which XLA emits from the sharded one-hot sum.

This is `jit`-with-shardings (GSPMD) rather than manual shard_map: the frame
is one big static-shape program, exactly what the XLA partitioner wants.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "tile") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _spec_for(x, mesh: Mesh, axis: str = "tile"):
    """Shard (H, W, ...) image-like arrays along H; replicate the rest.
    An array counts as image-like when its leading dim is divisible by the
    mesh size and it has rank >= 2 with a 'wide' second dim."""
    n = mesh.shape[axis]
    if (hasattr(x, "ndim") and x.ndim >= 2 and x.shape[0] % n == 0
            and x.shape[0] >= n and x.shape[1] >= 8):
        return NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
    return NamedSharding(mesh, P())


def frame_state_sharding(state, mesh: Mesh, axis: str = "tile"):
    """Sharding pytree for a FrameState: frame planes row-sharded, scalars
    replicated."""
    return jax.tree_util.tree_map(lambda x: _spec_for(x, mesh, axis), state)


def render_frame_sharded(ts, state, view, cfg, levels, mesh: Mesh,
                         axis: str = "tile"):
    """Jit `render_frame` with GSPMD shardings over `mesh` and run one frame.
    Returns (new_state, outputs). Used by tests and `dryrun_multichip`."""
    from ..frame import render_frame

    state_sh = frame_state_sharding(state, mesh, axis)
    repl = NamedSharding(mesh, P())
    ts_sh = jax.tree_util.tree_map(lambda _: repl, ts)
    view_sh = jax.tree_util.tree_map(lambda _: repl, view)

    def step(ts_, state_, view_):
        return render_frame(ts_, state_, view_, cfg, levels=levels)

    fn = jax.jit(step, in_shardings=(ts_sh, state_sh, view_sh))
    state = jax.device_put(state, state_sh)
    ts = jax.device_put(ts, ts_sh)
    view = jax.device_put(view, view_sh)
    return fn(ts, state, view)


def shard_rays_pt(ts, org, d, seed, mesh: Mesh, axis: str = "tile",
                  **pt_kwargs):
    """Sample/ray-parallel reference path trace: shard the flat (R, 3) ray
    batch across the mesh, trace independently (scene replicated), return the
    gathered (R, 3) radiance. Communication-free until the final gather."""
    from ..renderers.reference import path_trace

    ray_sh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    ts_sh = jax.tree_util.tree_map(lambda _: repl, ts)

    fn = jax.jit(
        lambda ts_, o, dd, s: path_trace(ts_, o, dd, s, **pt_kwargs),
        in_shardings=(ts_sh, ray_sh, ray_sh, ray_sh),
        out_shardings=ray_sh)
    org = jax.device_put(org, ray_sh)
    d = jax.device_put(d, ray_sh)
    seed = jax.device_put(seed, ray_sh)
    ts = jax.device_put(ts, ts_sh)
    return fn(ts, org, d, seed)
