"""Irradiance cache: temporally-recurrent volumetric radiance cache.

Role of `renderers/ircache.rs` + `assets/shaders/ircache/*` (doc
`gi-overview.md:208-300`): an eye-centered multi-cascade clipmap of sparse
irradiance probe entries, allocated output-sensitively from query points,
each tracing a few rays per frame and feeding every GI pass with
"infinite bounce" ambient light (the cache reads ITSELF from the previous
frame at its own ray hits).

TPU-first redesign of the GPU machinery:
  * the reference's scroll + age + prefix-scan + compact pipeline
    (`ircache.rs:168-506`) collapses into a few dense array ops: entries
    carry WORLD positions; the cell <- entry indirection grid is rebuilt
    every frame by one scatter (so "scrolling" is free — entries that fall
    out of their cascade simply stop being scattered and expire);
  * allocation = scatter query cells -> dedup winners -> `jnp.cumsum`
    prefix-scan compaction onto the free-slot list (the reference's explicit
    3-dispatch GPU scan, `prefix_scan.rs:10-39`, is literally one cumsum);
  * per-entry irradiance is stored as L1 spherical harmonics (RGB x 4
    coeffs, cf. `sum_up_irradiance.hlsl`), blended with temporal hysteresis.

Entries/budgets follow the reference scale: MAX_ENTRIES = 64Ki capacity with
a few-Ki active set, 4 rays traced per entry per frame (`ircache.rs:30-36`).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..brdf.sampling import uniform_sphere
from ..core import rng as rng_mod

# SH basis constants
_Y00 = 0.28209479
_Y1 = 0.48860251


@dataclass(frozen=True)
class IrcacheConfig:
    """Static configuration (shapes!). Capacity follows the reference scale
    (`ircache.rs:26-36`, `frame_constants.rs:4`): 64Ki entries, 12 cascades
    x 32^3 clipmap — at base_cell_size 0.25 the outermost cascade spans a
    +-8192-unit half-extent, enough for battle.ron-class worlds; the
    per-frame ray cost is bounded by `active_budget` — the reference's own
    typical active set is <=16k entries (`gi-overview.md:461-464`), and
    entries beyond the budget are traced round-robin across frames. The
    indirection grid costs cascades x 32^3 x 4 B = 1.5 MiB at 12."""

    cascades: int = 12
    grid_res: int = 32          # cells per cascade side
    max_entries: int = 65536    # `ircache.rs:30` MAX_ENTRIES = 64Ki
    rays_per_entry: int = 4     # `ircache.rs:35` IRCACHE_SAMPLES_PER_FRAME
    base_cell_size: float = 0.25
    expire_frames: int = 60     # unseen-for-N-frames entries are recycled
    hysteresis_frames: float = 32.0
    active_budget: int = 16384  # entries traced per frame (round-robin)
    validate_period: int = 3    # stored-ray re-trace cadence (frames)
    validate_rel: float = 0.5   # per-ray relative-luminance mismatch cut
    reposition_rate: float = 0.25  # voted nudge toward query points / frame


def init_state(cfg: IrcacheConfig):
    e, s = cfg.max_entries, cfg.rays_per_entry
    return {
        "ircache_pos": jnp.zeros((e, 3), jnp.float32),
        "ircache_sh": jnp.zeros((e, 3, 4), jnp.float32),   # RGB x (Y00,Y1-1,Y10,Y11)
        "ircache_life": jnp.zeros((e,), jnp.float32),      # frames of history
        "ircache_seen": jnp.full((e,), -(10 ** 6), jnp.int32),  # last-query frame
        "ircache_valid": jnp.zeros((e,), bool),
        # last trace's rays, kept for the every-Nth-frame validation re-trace
        # (`ircache_validate.rgen.hlsl` re-traces stored sample directions and
        # cuts history on mismatch)
        "ircache_ray_dir": jnp.zeros((e, s, 3), jnp.float32),
        "ircache_ray_rad": jnp.zeros((e, s, 3), jnp.float32),
    }


# ----------------------------------------------------------------------------
# Cell math
# ----------------------------------------------------------------------------

def _cascade_of(pos, eye, cfg):
    """Finest cascade whose clipmap (centered at eye) contains pos.
    Returns (cascade (..., int32), in_range (...,) bool)."""
    half_extent0 = cfg.base_cell_size * cfg.grid_res * 0.5
    d = jnp.max(jnp.abs(pos - eye), axis=-1)
    # cascade c covers |d| < half_extent0 * 2^c
    c = jnp.ceil(jnp.log2(jnp.maximum(d / half_extent0, 1e-6)))
    c = jnp.clip(c, 0, cfg.cascades - 1).astype(jnp.int32)
    in_range = d < half_extent0 * (2.0 ** (cfg.cascades - 1))
    return c, in_range


def _cell_of(pos, eye, cascade, cfg):
    """Integer cell coords within the cascade grid + flat grid index."""
    cell_size = cfg.base_cell_size * (2.0 ** cascade.astype(jnp.float32))
    origin_cell = jnp.floor(eye / cell_size[..., None]).astype(jnp.int32)
    cell = jnp.floor(pos / cell_size[..., None]).astype(jnp.int32)
    rel = cell - origin_cell + cfg.grid_res // 2
    ok = jnp.all((rel >= 0) & (rel < cfg.grid_res), axis=-1)
    rel = jnp.clip(rel, 0, cfg.grid_res - 1)
    g = cfg.grid_res
    flat = (cascade * g * g * g + rel[..., 0] * g * g + rel[..., 1] * g
            + rel[..., 2])
    return flat, ok, cell_size


def _entry_cells(state, eye, cfg):
    cas, in_range = _cascade_of(state["ircache_pos"], eye, cfg)
    flat, ok, _ = _cell_of(state["ircache_pos"], eye, cas, cfg)
    live = state["ircache_valid"] & in_range & ok
    return flat, live


def build_grid(state, eye, cfg: IrcacheConfig):
    """(C*G^3,) int32 entry index per cell, -1 = empty. One scatter — the
    re-designed 'scroll cascades' + indirection build."""
    flat, live = _entry_cells(state, eye, cfg)
    n_cells = cfg.cascades * cfg.grid_res ** 3
    grid = jnp.full((n_cells,), -1, jnp.int32)
    ids = jnp.arange(cfg.max_entries, dtype=jnp.int32)
    return grid.at[jnp.where(live, flat, 0)].max(
        jnp.where(live, ids, -1), mode="promise_in_bounds")


# ----------------------------------------------------------------------------
# Allocation (age -> scan -> compact, re-designed)
# ----------------------------------------------------------------------------

def build_value_grid(state, grid, cfg: IrcacheConfig):
    """(C, 13) f32 per-cell payload [SH(12), life] of the cell's entry;
    zero rows = empty cell (conf 0 -> sky fallback in lookup).

    Rationale (round-4 1080p profile): the lookup's cell->entry 1-wide s32
    gather costs ~6.6 ns/row on XLA's serial path (6.9 ms for the 1M-ray
    GI wavefront) while a 13-wide row gather costs ~1.3 ns/row; baking the
    entry payload into the cell rows turns the double gather into one wide
    fetch. Built once per frame from the index grid: one 13-wide gather
    over C cells (~0.5 ms)."""
    e = cfg.max_entries
    rows = jnp.concatenate([state["ircache_sh"].reshape(e, 12),
                            state["ircache_life"][:, None]], axis=-1)
    has = grid >= 0
    vg = rows.at[jnp.where(has, grid, 0)].get(mode="promise_in_bounds")
    return jnp.where(has[:, None], vg, 0.0)


def allocate(state, grid, query_pos, query_mask, eye, frame_idx,
             cfg: IrcacheConfig):
    """Allocate entries for query cells that lack one; touch existing ones.

    query_pos: (Q, 3) surface points wanting GI (the reference allocates from
    rtdgi/rtr hit points, `gi-overview.md:208-240`). Returns new state.
    """
    cas, in_range = _cascade_of(query_pos, eye, cfg)
    flat, ok, cell_size = _cell_of(query_pos, eye, cas, cfg)
    valid_q = query_mask & in_range & ok
    n_cells = cfg.cascades * cfg.grid_res ** 3

    fi = jnp.asarray(frame_idx, jnp.int32)
    existing = grid[flat]                       # (Q,) entry id or -1
    # --- touch: update last-seen for queried entries (masked scatter-max)
    touch = valid_q & (existing >= 0)
    seen = state["ircache_seen"].at[jnp.where(touch, existing, 0)].max(
        jnp.where(touch, fi, -(10 ** 6)), mode="promise_in_bounds")

    # --- requests: one winner query per empty cell (scatter-max dedup)
    wants = valid_q & (existing < 0)
    qid = jnp.arange(query_pos.shape[0], dtype=jnp.int32)
    req_grid = jnp.full((n_cells,), -1, jnp.int32)
    req_grid = req_grid.at[jnp.where(wants, flat, 0)].max(
        jnp.where(wants, qid, -1), mode="promise_in_bounds")
    is_winner = wants & (req_grid[flat] == qid)

    # --- free slots: invalid or expired entries
    expired = (fi - seen) > cfg.expire_frames
    free = (~state["ircache_valid"]) | expired
    # prefix-scan compaction ranks (one jnp.cumsum = the reference's
    # 3-dispatch GPU prefix scan)
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1          # (E,)
    win_rank = jnp.cumsum(is_winner.astype(jnp.int32)) - 1      # (Q,)
    n_free = free_rank[-1] + 1

    # match winner k with the k-th free slot via an inverse map:
    # rank -> winning query id (unique indices; deterministic scatter)
    rank_to_q = jnp.full((cfg.max_entries,), -1, jnp.int32)
    w_ok = is_winner & (win_rank < cfg.max_entries)
    rank_to_q = rank_to_q.at[jnp.where(w_ok, win_rank, 0)].max(
        jnp.where(w_ok, qid, -1), mode="promise_in_bounds")

    # per-slot source query: slot is free AND its free-rank has a winner
    src_q = jnp.where(free, rank_to_q[jnp.clip(free_rank, 0, cfg.max_entries - 1)],
                      -1)                                        # (E,)
    writes = src_q >= 0
    sq = jnp.maximum(src_q, 0)

    # seed the probe AT the query point (new entries start on-surface)
    pos = jnp.where(writes[:, None], query_pos[sq], state["ircache_pos"])
    sh = jnp.where(writes[:, None, None], 0.0, state["ircache_sh"])
    life = jnp.where(writes, 0.0, state["ircache_life"])
    seen = jnp.where(writes, fi, seen)
    valid = jnp.where(writes, True, state["ircache_valid"] & ~expired)
    # a recycled slot must not validate against its previous occupant's rays
    ray_dir = jnp.where(writes[:, None, None], 0.0, state["ircache_ray_dir"])
    ray_rad = jnp.where(writes[:, None, None], 0.0, state["ircache_ray_rad"])

    # --- reposition voting (`gi-overview.md:270-300` ranked votes): existing
    # entries drift toward the cell's winning query point, so a probe keeps
    # tracking the surface its cell is actually shading as geometry/views
    # move. One scatter-max elects the vote; rate-limited nudge applies it.
    vote_grid = jnp.full((n_cells,), -1, jnp.int32)
    vote_grid = vote_grid.at[jnp.where(touch, flat, 0)].max(
        jnp.where(touch, qid, -1), mode="promise_in_bounds")
    ecas, e_in = _cascade_of(pos, eye, cfg)
    eflat, e_ok, _ = _cell_of(pos, eye, ecas, cfg)
    vq = jnp.where(valid & e_in & e_ok,
                   vote_grid.at[eflat].get(mode="promise_in_bounds"), -1)
    has_vote = (vq >= 0) & ~writes
    target = query_pos[jnp.maximum(vq, 0)]
    r = cfg.reposition_rate
    pos = jnp.where(has_vote[:, None], pos * (1.0 - r) + target * r, pos)

    return {
        "ircache_pos": pos, "ircache_sh": sh, "ircache_life": life,
        "ircache_seen": seen, "ircache_valid": valid,
        "ircache_ray_dir": ray_dir, "ircache_ray_rad": ray_rad,
    }


# ----------------------------------------------------------------------------
# Trace + SH update
# ----------------------------------------------------------------------------

def trace_update(state, ts, sky_env, diffuse_env, eye, frame_idx,
                 cfg: IrcacheConfig, max_trace_steps=None,
                 secondary_full_shading: bool = False):
    """Trace rays_per_entry uniform-sphere rays for up to `active_budget`
    live entries and blend their SH estimates ('trace irradiance' + 'sum up
    irradiance' passes).

    Budgeting: a prefix-scan compaction picks the frame's active subset with
    a round-robin offset, so when more than `active_budget` entries are live
    every entry is still refreshed within ceil(live/budget) frames while the
    per-frame ray wavefront stays a fixed (budget * S) shape — the TPU
    analog of the reference's dispatch-indirect entry list
    (`prepare_trace_dispatch_args.hlsl`).

    Validation: every `validate_period` frames the traced directions are the
    PREVIOUS trace's stored directions instead of fresh ones; a large
    per-ray relative luminance change against the stored radiance means the
    lighting changed, and the entry's history is cut so the new estimate
    takes over within a few frames (`ircache_validate.rgen.hlsl`'s
    invalidation, at zero extra rays — the re-trace doubles as the regular
    irradiance sample).

    The hit lighting's ambient term reads the CURRENT cache arrays (i.e. last
    frame's irradiance) — the temporal recurrence that makes bounces
    infinite, `gi-overview.md:208-230`."""
    from .hit_lighting import hit_radiance
    from ..rt.trace import scene_trace_closest

    e, s = cfg.max_entries, cfg.rays_per_entry
    b = min(cfg.active_budget, e)
    live = state["ircache_valid"]
    fi = jnp.asarray(frame_idx, jnp.int32)

    # --- active-set compaction (one cumsum = the reference's GPU scan)
    rank = jnp.cumsum(live.astype(jnp.int32)) - 1            # (E,)
    n_live = jnp.maximum(rank[-1] + 1, 1)
    offset = (fi * b) % n_live                                # round-robin
    slot = jnp.where(live, (rank - offset) % n_live, b)       # (E,)
    sel = live & (slot < b)
    ids = jnp.arange(e, dtype=jnp.int32)
    lst = jnp.full((b,), -1, jnp.int32)
    lst = lst.at[jnp.where(sel, slot, 0)].max(
        jnp.where(sel, ids, -1), mode="promise_in_bounds")    # (B,) entry ids
    alive_b = lst >= 0
    eidx = jnp.maximum(lst, 0)                                # (B,)
    pos_b = state["ircache_pos"][eidx]                        # (B, 3)

    # one flat wavefront of B*S rays (static shape; dead lanes masked).
    # broadcast+reshape instead of repeat/tile: identical semantics, but
    # repeat/tile lower to gather-style HLO that feeds the TPU backend's
    # crashing fusion path (see the barrier notes below)
    eid_r = jnp.broadcast_to(eidx.astype(jnp.uint32)[:, None],
                             (b, s)).reshape(-1)
    sid_r = jax.lax.broadcasted_iota(jnp.uint32, (b, s), 1).reshape(-1)
    rngs = rng_mod.hash3(eid_r, jnp.uint32(frame_idx), sid_r)
    u1, rngs = rng_mod.rand_u01(rngs)
    u2, rngs = rng_mod.rand_u01(rngs)
    d_fresh = uniform_sphere(u1, u2)                          # (B*S, 3)

    # validation frames re-trace the stored directions (where one exists)
    d_stored = state["ircache_ray_dir"][eidx].reshape(-1, 3)  # (B*S, 3)
    validate = (fi % cfg.validate_period) == 0
    has_stored = jnp.sum(d_stored * d_stored, axis=-1) > 0.25
    use_stored = validate & has_stored
    d = jnp.where(use_stored[:, None], d_stored, d_fresh)

    o = jnp.broadcast_to(pos_b[:, None, :], (b, s, 3)).reshape(-1, 3) + d * 1e-3
    live_r = jnp.broadcast_to(alive_b[:, None], (b, s)).reshape(-1)

    hit = scene_trace_closest(ts, o, d, t_min=1e-4,
                              max_steps=max_trace_steps)

    # ambient at the hit comes from the cache itself (previous frame's SH)
    grid = build_grid(state, eye, cfg)

    def cache_lookup(p, n):
        return lookup_irradiance(state, grid, p, n, eye, diffuse_env, cfg)

    rad = hit_radiance(ts, hit, d, sky_env, diffuse_env,
                       ircache_lookup=cache_lookup,
                       max_trace_steps=max_trace_steps, rng=rngs,
                       full_shading=secondary_full_shading)
    rad = jnp.where(live_r[:, None], rad, 0.0)
    # fusion fence (see barrier note below)
    rad, d = jax.lax.optimization_barrier((rad, d))

    # --- validation verdict: per-ray relative luminance mismatch
    old_rad = state["ircache_ray_rad"][eidx].reshape(-1, 3)   # (B*S, 3)
    lum = jnp.array([0.2126, 0.7152, 0.0722], jnp.float32)
    l_new = rad @ lum
    l_old = old_rad @ lum
    rel = jnp.abs(l_new - l_old) / jnp.maximum(
        jnp.maximum(l_new, l_old), 1e-3)
    mism = (use_stored & (rel > cfg.validate_rel)).reshape(b, s)
    checked = use_stored.reshape(b, s)
    # cut history when >=half the checked rays disagree (single-ray noise at
    # silhouettes must not flush a converged probe)
    n_checked = checked.sum(axis=1)
    cut = alive_b & (n_checked > 0) & (
        mism.sum(axis=1) * 2 >= jnp.maximum(n_checked, 1))

    # project onto SH: L_lm = (4pi / S) * sum radiance * Y_lm(d)
    y = jnp.stack([jnp.full_like(d[:, 0], _Y00),
                   _Y1 * d[:, 1], _Y1 * d[:, 2], _Y1 * d[:, 0]], axis=-1)
    contrib = rad[:, :, None] * y[:, None, :]                 # (B*S, 3, 4)
    sh_new = contrib.reshape(b, s, 3, 4).sum(axis=1) * (4.0 * jnp.pi / s)

    life_b = state["ircache_life"][eidx]                      # (B,)
    life_b = jnp.where(cut, jnp.minimum(life_b, 2.0), life_b)
    life_b = jnp.minimum(life_b + 1.0, cfg.hysteresis_frames)
    alpha = (1.0 / jnp.maximum(life_b, 1.0))[:, None, None]
    sh_b = state["ircache_sh"][eidx] * (1 - alpha) + sh_new * alpha

    # --- scatter the traced subset back (drop-mode index E for dead lanes)
    widx = jnp.where(alive_b, eidx, e)
    sh = state["ircache_sh"].at[widx].set(sh_b, mode="drop")
    life = state["ircache_life"].at[widx].set(life_b, mode="drop")
    sh = jnp.where(live[:, None, None], sh, 0.0)
    life = jnp.where(live, life, 0.0)
    ray_dir = state["ircache_ray_dir"].at[widx].set(
        d.reshape(b, s, 3), mode="drop")
    ray_rad = state["ircache_ray_rad"].at[widx].set(
        rad.reshape(b, s, 3), mode="drop")

    # fence the cache-update subgraph: the TPU backend's priority-fusion
    # cost model has been observed to crash (SIGILL) when this wavefront is
    # fused into the surrounding frame; the barrier bounds fusion scope
    sh, life = jax.lax.optimization_barrier((sh, life))

    out = dict(state)
    out["ircache_sh"] = sh
    out["ircache_life"] = life
    out["ircache_ray_dir"] = ray_dir
    out["ircache_ray_rad"] = ray_rad
    return out


# ----------------------------------------------------------------------------
# Lookup
# ----------------------------------------------------------------------------

def lookup_irradiance(state, grid, pos, normal, eye, diffuse_env,
                      cfg: IrcacheConfig):
    """E(n)/pi at world positions. Falls back to the convolved sky where no
    entry exists (young entries are blended in by history length)."""
    from ..sky.env import sample_env

    if grid is None:
        grid = build_grid(state, eye, cfg)
    cas, in_range = _cascade_of(pos, eye, cfg)
    flat, ok, _ = _cell_of(pos, eye, cas, cfg)
    if getattr(grid, "ndim", 1) == 2:
        # value grid (build_value_grid): ONE 13-wide row fetch per query
        safe = jnp.where(in_range & ok, flat, 0)
        row = grid.at[safe].get(mode="promise_in_bounds")
        row = jnp.where((in_range & ok)[..., None], row, 0.0)
    else:
        entry = jnp.where(in_range & ok,
                          grid.at[flat].get(mode="promise_in_bounds"), -1)
        se = jnp.maximum(entry, 0)

        # SH coeffs + lifetime packed into one 13-wide row -> ONE gather
        # per query instead of three (XLA CSEs the pack across call sites)
        e_total = state["ircache_sh"].shape[0]
        lut = jnp.concatenate([
            state["ircache_sh"].reshape(e_total, 12),
            state["ircache_life"][:, None]], axis=-1)
        row = lut.at[se].get(mode="promise_in_bounds")   # (..., 13)
        row = jnp.where((entry >= 0)[..., None], row, 0.0)
    sh = row[..., :12].reshape(row.shape[:-1] + (3, 4))
    n = normal
    # E(n)/pi = L00 Y00 + (2/3) sum L1m Y1m(n) — explicit slice math (a
    # batched (3,4)x(4,) einsum hits XLA's pathological tiny-dot path)
    b0 = _Y00
    b1 = (2.0 / 3.0) * _Y1 * n[..., 1]
    b2 = (2.0 / 3.0) * _Y1 * n[..., 2]
    b3 = (2.0 / 3.0) * _Y1 * n[..., 0]
    e_over_pi = jnp.maximum(
        sh[..., 0] * b0 + sh[..., 1] * b1[..., None]
        + sh[..., 2] * b2[..., None] + sh[..., 3] * b3[..., None], 0.0)

    # young entries: blend toward sky fallback by confidence. Missing
    # entries carry a zeroed row (conf 0), so the blend alone handles them.
    conf = jnp.clip(row[..., 12] / 4.0, 0.0, 1.0)[..., None]
    fallback = sample_env(diffuse_env, n)
    return e_over_pi * conf + fallback * (1 - conf)
