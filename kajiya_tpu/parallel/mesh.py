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


def _sharded_step(ts, state, view, cfg, levels, mesh: Mesh,
                  axis: str = "tile"):
    """(jitted_fn, placed_args) for the GSPMD frame step — shared by the
    runner, the HLO-quality test, and `dryrun_multichip`'s cost summary."""
    from ..frame import render_frame

    state_sh = frame_state_sharding(state, mesh, axis)
    repl = NamedSharding(mesh, P())
    ts_sh = jax.tree_util.tree_map(lambda _: repl, ts)
    view_sh = jax.tree_util.tree_map(lambda _: repl, view)

    def step(ts_, state_, view_):
        return render_frame(ts_, state_, view_, cfg, levels=levels)

    fn = jax.jit(step, in_shardings=(ts_sh, state_sh, view_sh))
    args = (jax.device_put(ts, ts_sh), jax.device_put(state, state_sh),
            jax.device_put(view, view_sh))
    return fn, args


def render_frame_sharded(ts, state, view, cfg, levels, mesh: Mesh,
                         axis: str = "tile"):
    """Jit `render_frame` with GSPMD shardings over `mesh` and run one frame.
    Returns (new_state, outputs). Used by tests and `dryrun_multichip`."""
    fn, args = _sharded_step(ts, state, view, cfg, levels, mesh, axis)
    return fn(*args)


def compile_frame_sharded(ts, state, view, cfg, levels, mesh: Mesh,
                          axis: str = "tile"):
    """Lower + compile the sharded frame step WITHOUT running it. Returns
    the jax `Compiled` object (post-GSPMD, post-optimization HLO via
    `.as_text()`, per-device cost via `.cost_analysis()`)."""
    fn, args = _sharded_step(ts, state, view, cfg, levels, mesh, axis)
    return fn.lower(*args).compile()


def collective_summary(compiled):
    """Count + total payload bytes of each collective kind in the optimized
    HLO of a compiled sharded program.

    This is the sharding-quality contract (SURVEY.md §2.8): with replicated
    scene tables and row-sharded frame planes, cross-chip traffic is
    (a) halo exchanges for filter stencils (collective-permute of boundary
    rows), (b) small reductions (histogram/exposure all-reduce), and (c)
    wavefront-sized distributed gathers from the screen-space radiance
    reuse (a secondary hit can project ANYWHERE on screen, so GSPMD gathers
    from the row shard that owns the pixel: all-gather of (rays, 2) indices
    + all-reduce of the (rays,) partials — real algorithmic traffic that
    rides ICI, not a partitioner fallback). What must NEVER appear is a
    replication fallback: a collective moving MANY planes at once (the
    state pytree is ~40 planes, so a blow-up is an order of magnitude above
    any single-plane gather).

    Sizing rule: a replication fallback materializes ONE unsharded ARRAY,
    so the classification metric is the largest single tuple ELEMENT, not
    the tuple total. XLA legitimately batches independent payloads into
    one tuple-valued collective — e.g. the ReSTIR spatial tap scan's
    per-tap masked-partial-fetch reductions fuse into a single all-reduce
    of (n_taps x 20-channel) arrays; same traffic as n_taps separate
    collectives, fewer launches. Tuple totals still land in
    `bytes`/`max_bytes` for traffic accounting.

    HLO result lines look like
      %name = f32[128,64]{1,0} all-gather(%op), ...
      %name = (f32[16,8]{...}, f32[16,8]{...}) all-to-all(...), ...
    (result type AFTER the '=', tuples for multi-operand all-to-alls)."""
    import re

    text = compiled.as_text()
    _elem_bytes = {"f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4,
                   "u32": 4, "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
                   "pred": 1, "s8": 1, "u8": 1}
    _shape = re.compile(r"(\w+)\[([\d,]*)\]")
    out = {}
    for line in text.splitlines():
        m = re.search(
            r"=\s*(\([^)]*\)|\S+)\s+(all-gather|all-reduce|"
            r"collective-permute|all-to-all|reduce-scatter)\(", line)
        if not m:
            continue
        result_ty, kind = m.group(1), m.group(2)
        nbytes = 0
        elem_max = 0
        for dtype, dims in _shape.findall(result_ty):
            n = 1
            for dpart in dims.split(","):
                if dpart:
                    n *= int(dpart)
            b = n * _elem_bytes.get(dtype, 4)
            nbytes += b
            elem_max = max(elem_max, b)
        ent = out.setdefault(kind, {"count": 0, "bytes": 0, "max_bytes": 0})
        ent["count"] += 1
        ent["bytes"] += nbytes
        ent["max_bytes"] = max(ent["max_bytes"], nbytes)
        op = re.search(r'op_name="([^"]*)"', line)
        if op and "ircache" in op.group(1):
            ent["cache_max_bytes"] = max(ent.get("cache_max_bytes", 0),
                                         elem_max)
        else:
            ent["plane_max_bytes"] = max(ent.get("plane_max_bytes", 0),
                                         elem_max)
    return out


def check_sharding_quality(compiled, height: int, width: int,
                           warp_planes: int = 24,
                           cache_bytes: int = 8 << 20):
    """The sharding-quality contract, shared by tests and dryrun_multichip.
    Returns (summary, problems); empty problems = contract holds.

    Measured taxonomy of the sharded frame's collectives (8-way row
    sharding, cornell 128x64 — tools/probe_collectives.py):
      * collective-permute, <= ~half a plane: halo rows for filter stencils
        and the boundary terms of near-diagonal one-hot resampling matmuls.
      * all-gather / all-reduce of k*plane, k <= ~20 per tuple ELEMENT:
        distributed gathers — screen-space reuse and temporal warps fetch
        from whichever row shard owns the source pixel (GSPMD: all-gather
        the (rays, 2) indices, all-reduce the masked partial fetch), and
        one-hot resample matmuls contract over the sharded row axis. k =
        channel count of the warped bundle (TAA packed warp = 9, rtr
        resolve dot = 15, ReSTIR spatial tap = 20 incl. fallback padding),
        NOT the ~40-plane state: a replication fallback materializes one
        array spanning the state and would blow past `warp_planes`
        immediately. XLA may batch many such elements into one
        tuple-valued collective (the tap scan's 7 taps fuse into a single
        all-reduce) — sizing is per element (see collective_summary).
      * ircache scatter/gather reductions: pool-sized (scene-structure)
        constants, independent of resolution — sharded rays voting into
        the replicated cache via psum is the intended design (SURVEY
        §2.8). Bounded by `cache_bytes`, not by plane multiples.
    """
    summary = collective_summary(compiled)
    plane = height * width * 4
    problems = []
    if not summary:
        problems.append("no collectives at all: the partitioner either "
                        "replicated every pass or ran nothing sharded")
    for kind, ent in summary.items():
        if ent.get("plane_max_bytes", 0) > warp_planes * plane:
            problems.append(
                f"{kind}: screen-space collective moves "
                f"{ent['plane_max_bytes']}B > {warp_planes} planes "
                f"({warp_planes * plane}B) — replication fallback?")
        if ent.get("cache_max_bytes", 0) > cache_bytes:
            problems.append(
                f"{kind}: ircache collective moves "
                f"{ent['cache_max_bytes']}B > {cache_bytes}B")
    return summary, problems


# ----------------------------------------------------------------------------
# Multi-host / DCN (SURVEY.md section 2.8): a 2-D ("host", "tile") mesh whose
# outer axis spans processes (DCN links) and whose inner axis spans each
# host's local chips (ICI). Frame rows shard across BOTH axes host-major, so
# a screen-space filter's halo exchange crosses DCN only at the single row
# boundary between adjacent hosts — every other halo rides ICI. The
# histogram/exposure psum crosses DCN once per frame (256 floats).
# ----------------------------------------------------------------------------

def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Bring up JAX's multi-process runtime (call once per host before any
    jax op, mirrors `jax.distributed.initialize`). On a single host this is
    a no-op and the multihost mesh degrades to device-only axes."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)


def make_multihost_mesh(shape: tuple | None = None,
                        axes: tuple = ("host", "tile")) -> Mesh:
    """(n_hosts, devices_per_host) mesh. Devices are grouped host-major by
    `process_index`, so the inner ("tile") axis always stays on one host's
    ICI domain and only the outer ("host") axis crosses DCN.

    shape: explicit (hosts, per_host) — used by tests to emulate hosts on a
    virtual single-process device pool; default = the true process layout."""
    devs = jax.devices()
    if shape is None:
        n_hosts = max(d.process_index for d in devs) + 1
        per_host = len(devs) // n_hosts
        shape = (n_hosts, per_host)
    n_hosts, per_host = shape
    ordered = sorted(devs, key=lambda d: (d.process_index, d.id))
    grid = np.array(ordered[: n_hosts * per_host]).reshape(n_hosts, per_host)
    return Mesh(grid, axes)


def distribute_scene(pytree):
    """DCN scene distribution: process 0 (the host that loaded/baked the
    scene) broadcasts the scene pytree to every other host. Single-process:
    identity. (`world_renderer.rs` has no analog — the reference is
    single-machine; this is the §2.8 'multi-host scene distribution' axis.)"""
    if jax.process_count() <= 1:
        return pytree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(pytree)


def _spec_for_multihost(x, mesh: Mesh, axes=("host", "tile")):
    """Row-shard image planes across (host x tile) jointly, host-major."""
    n = mesh.shape[axes[0]] * mesh.shape[axes[1]]
    if (hasattr(x, "ndim") and x.ndim >= 2 and x.shape[0] % n == 0
            and x.shape[0] >= n and x.shape[1] >= 8):
        return NamedSharding(mesh, P(axes, *([None] * (x.ndim - 1))))
    return NamedSharding(mesh, P())


def render_frame_multihost(ts, state, view, cfg, levels, mesh: Mesh,
                           axes=("host", "tile")):
    """`render_frame` over a ("host", "tile") mesh: rows sharded across all
    devices host-major (halos on ICI except at host seams), scene/BVH
    replicated per device, cross-host reductions (exposure histogram)
    emitted by GSPMD as DCN psums."""
    from ..frame import render_frame

    state_sh = jax.tree_util.tree_map(
        lambda x: _spec_for_multihost(x, mesh, axes), state)
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
