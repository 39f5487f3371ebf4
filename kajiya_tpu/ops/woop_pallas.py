"""Pallas TPU kernel for the Woop brute-force intersector.

The Pallas twin of `ops/woop.py::intersect_brute` (see that module for the
math): ray-lane layout transposed so RAYS RIDE THE LANES — inputs are
(4, R) / (3, R), the triangle transform table lives fully in VMEM, and each
grid step intersects one ray block against all triangle blocks in an
in-register running-min loop. Compared to the XLA version this pins the
working set in VMEM explicitly and never spills (TB, RB) intermediates.

The computation is K=4 batched-small-matmul work — inherently VPU, not MXU
(systolic depth unused at K=4) — so the kernel emits broadcast-FMA chains
rather than `dot`. Triangle counts must be padded to TRI_BLOCK (done by
`build_woop`'s pad_to; invalid triangles have zeroed rows -> rw == 0 ->
rejected).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1e30  # python float: jnp scalars would be captured as consts by pallas

TRI_BLOCK = 128
RAY_BLOCK = 512


def _kernel(o_ref, d_ref, ao_ref, ad_ref, tmax_ref, t_ref, tri_ref, u_ref,
            v_ref, *, n_tri_blocks: int, t_min: float, tb: int = TRI_BLOCK,
            any_hit: bool = False):
    rb = o_ref.shape[1]

    ox, oy, oz, ow = (o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :],
                      o_ref[3:4, :])
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    tmax = tmax_ref[0:1, :]

    def body(i, carry):
        t_best, tri_best, u_best, v_best = carry
        s = i * tb
        # (3TB, 4) / (3TB, 3) slices: rows [u|v|w] x TB for this block
        ao = ao_ref[pl.ds(s * 3, 3 * tb), :]
        ad = ad_ref[pl.ds(s * 3, 3 * tb), :]
        aou, aov, aow = ao[0:tb], ao[tb:2 * tb], ao[2 * tb:]
        adu, adv, adw = ad[0:tb], ad[tb:2 * tb], ad[2 * tb:]

        # q = A o + b (affine), r = A d — broadcast FMA chains (TB, RB)
        def affine(m):
            return (m[:, 0:1] * ox + m[:, 1:2] * oy + m[:, 2:3] * oz
                    + m[:, 3:4] * ow)

        def linear(m):
            return m[:, 0:1] * dx + m[:, 1:2] * dy + m[:, 2:3] * dz

        qu, qv, qw = affine(aou), affine(aov), affine(aow)
        ru, rv, rw = linear(adu), linear(adv), linear(adw)

        rw_ok = jnp.abs(rw) >= 1e-12
        rw_safe = jnp.where(rw_ok, rw, 1e-12)
        t = -qw / rw_safe
        u = qu + t * ru
        v = qv + t * rv
        beps = 1e-5   # crack-closing barycentric slack (see ops/woop.py)
        ok = (rw_ok & (u >= -beps) & (v >= -beps) & (u + v <= 1.0 + beps)
              & (t > t_min) & (t < t_best) & (t < tmax))
        t_m = jnp.where(ok, t, jnp.float32(INF))
        bt = jnp.min(t_m, axis=0, keepdims=True)                  # (1, RB)
        # int iota + convert: Mosaic rejects float-typed tpu.iota
        rows = jax.lax.broadcasted_iota(jnp.int32, (tb, rb), 0
                                        ).astype(jnp.float32)
        sel = t_m <= bt
        ridx = jnp.min(jnp.where(sel, rows, jnp.float32(tb)), axis=0,
                       keepdims=True)
        first = rows == ridx
        bu = jnp.sum(jnp.where(first, u, 0.0), axis=0, keepdims=True)
        bv = jnp.sum(jnp.where(first, v, 0.0), axis=0, keepdims=True)
        closer = bt < t_best
        return (jnp.where(closer, bt, t_best),
                jnp.where(closer, jnp.float32(s) + ridx, tri_best),
                jnp.where(closer, bu, u_best),
                jnp.where(closer, bv, v_best))

    init = (jnp.full((1, rb), jnp.float32(INF), jnp.float32),
            jnp.full((1, rb), -1.0, jnp.float32),
            jnp.zeros((1, rb), jnp.float32),
            jnp.zeros((1, rb), jnp.float32))
    if any_hit:
        # occlusion rays: this whole ray block parks as soon as every LIVE
        # lane has found SOME hit (no need for the closest one); dead padded
        # lanes (tmax<=t_min) can never hit and must not defeat the exit
        def w_cond(st):
            k, (_t, tri_b, _u, _v) = st
            return (k < n_tri_blocks) & jnp.any((tri_b < 0.0)
                                                & (tmax > t_min))

        def w_body(st):
            k, carry = st
            return k + 1, body(k, carry)

        _, (t_best, tri_best, u_best, v_best) = jax.lax.while_loop(
            w_cond, w_body, (jnp.int32(0), init))
    else:
        t_best, tri_best, u_best, v_best = jax.lax.fori_loop(
            0, n_tri_blocks, body, init)
    t_ref[:, :] = t_best
    tri_ref[:, :] = tri_best
    u_ref[:, :] = u_best
    v_ref[:, :] = v_best


def intersect_scene_pallas(woop, org, d, t_min=1e-4, t_max=None,
                           any_hit: bool = False):
    """Scene-level entry used by rt.trace on TPU. Small scenes run the
    resident-table kernel; larger scenes run the cluster-culled streaming
    kernel (per-chunk active-block lists + double-buffered block DMA)."""
    if woop.get("cmin") is not None:
        return intersect_culled_pallas(woop, org, d, t_min=t_min,
                                       t_max=t_max, any_hit=any_hit)
    return intersect_brute_pallas(woop, org, d, t_min=t_min, t_max=t_max,
                                  any_hit=any_hit)


# ----------------------------------------------------------------------------
# Cluster-culled streaming tracer (the software TLAS+BLAS traversal for
# scenes beyond VMEM residency; replaces the reference's hardware TraceRay
# for battle/diorama-class meshes, `vulkan/ray_tracing.rs`)
# ----------------------------------------------------------------------------

CULL_TB = 64            # triangles per culled block (finer = tighter culling)
CULL_RAY_BLOCK = 2048   # rays per chunk (wider = fewer chunks, looser beams)


def _chunk_beams(org, d, tmax, nrb, rb):
    """Per-chunk bounding beam: origin sphere + direction cone.

    Also returns `coherent` (nrb,) bool: True only when every live ray in
    the chunk genuinely fits a <~87deg cone around the mean direction.
    Divergent chunks (coherent=False) must not be cone-culled at all —
    clamping cosh upward used to cull clusters behind the mean axis that
    backward-pointing rays could still hit (silent light leaks)."""
    o = org.reshape(nrb, rb, 3)
    dd = d.reshape(nrb, rb, 3)
    live = (tmax.reshape(nrb, rb) > 0.0)                    # padded lanes out
    any_live = live.any(axis=1)
    oc = o.mean(axis=1)                                     # (nrb, 3)
    ro = jnp.sqrt(jnp.maximum(
        ((o - oc[:, None]) ** 2).sum(-1), 0.0)).max(axis=1)  # (nrb,)
    axis = dd.mean(axis=1, where=live[..., None])
    axis = jnp.where(any_live[:, None], axis, 0.0)
    alen = jnp.sqrt((axis * axis).sum(-1, keepdims=True))
    axis = axis / jnp.maximum(alen, 1e-8)
    mincos = jnp.min(jnp.where(live, (dd * axis[:, None]).sum(-1), 1.0),
                     axis=1)
    coherent = (mincos >= 0.05) & (alen[:, 0] >= 1e-6) & any_live
    cosh = jnp.clip(mincos, 0.05, 1.0)
    tmax_c = tmax.reshape(nrb, rb).max(axis=1)
    return oc, ro, axis, cosh, tmax_c, coherent


def _active_blocks(woop, org, d, tmax, nrb, rb):
    """(blist (nrb, C) i32 active-first block ids, count (nrb,) i32) from a
    conservative beam-vs-cluster-sphere test. False positives only cost
    extra visited blocks; chunks whose rays don't genuinely fit a cone
    (divergent bounce/GI chunks) skip the cone test entirely and visit
    every in-range block — conservatism over speed."""
    cmin, cmax = woop["cmin64"], woop["cmax64"]             # (C, 3)
    c = (cmin + cmax) * 0.5
    rbnd = jnp.sqrt(jnp.maximum(((cmax - cmin) * 0.5) ** 2, 0.0).sum(-1))
    rbnd = jnp.where(jnp.isfinite(rbnd), rbnd, -1.0)        # empty block
    oc, ro, axis, cosh, tmax_c, coherent = _chunk_beams(org, d, tmax, nrb,
                                                        rb)

    v = c[None, :, :] - oc[:, None, :]                      # (nrb, C, 3)
    proj = (v * axis[:, None, :]).sum(-1)
    d2 = (v * v).sum(-1)
    dperp = jnp.sqrt(jnp.maximum(d2 - proj * proj, 0.0))
    dist = jnp.sqrt(d2)
    rr = ro[:, None] + rbnd[None, :]
    tanh_ = jnp.sqrt(jnp.maximum(1.0 - cosh * cosh, 0.0)) / cosh
    cone_hit = ((proj >= -rr)
                & (proj - rr <= tmax_c[:, None])
                & (dperp <= jnp.maximum(proj, 0.0) * tanh_[:, None]
                   + rr / cosh[:, None]))
    # divergent chunks: only an origin-sphere distance test (any direction
    # possible, so every block within tmax of the origin sphere is live)
    sphere_hit = (dist - rr <= tmax_c[:, None])
    hit = ((rbnd[None, :] >= 0.0)
           & jnp.where(coherent[:, None], cone_hit, sphere_hit))
    ncl = hit.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, hit.shape, 1)
    keys = jnp.where(hit, iota, iota + 2 * ncl)
    blist = jnp.sort(keys, axis=1) % (2 * ncl)              # active first
    count = hit.sum(axis=1).astype(jnp.int32)
    return blist.astype(jnp.int32), count


def _kernel_culled(count_ref, o_ref, d_ref, tmax_ref, blist_hbm,
                   ao_hbm, ad_hbm, t_ref, tri_ref, u_ref, v_ref,
                   blbuf, aobuf, adbuf, blsem, sem, *, t_min: float,
                   any_hit: bool):
    rb = o_ref.shape[1]
    tb = CULL_TB
    i = pl.program_id(0)
    cnt = count_ref[i]

    # fetch this chunk's active-block row (flat in HBM; 1-D slices avoid
    # Pallas' 2-D sublane alignment constraints)
    ntp = blbuf.shape[0]
    row = pl.multiple_of(i * ntp, 128)
    bl_dma = pltpu.make_async_copy(
        blist_hbm.at[pl.ds(row, ntp)], blbuf, blsem)
    bl_dma.start()
    bl_dma.wait()

    def start_dma(k_idx, slot):
        blk = blbuf[k_idx]
        s = pl.multiple_of(blk * (3 * tb), 8)
        pltpu.make_async_copy(ao_hbm.at[pl.ds(s, 3 * tb), :],
                              aobuf.at[slot], sem.at[slot, 0]).start()
        pltpu.make_async_copy(ad_hbm.at[pl.ds(s, 3 * tb), :],
                              adbuf.at[slot], sem.at[slot, 1]).start()

    @pl.when(cnt > 0)
    def _():
        start_dma(0, 0)

    ox, oy, oz, ow = (o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :],
                      o_ref[3:4, :])
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    tmax = tmax_ref[0:1, :]

    def visit(k, carry):
        t_best, tri_best, u_best, v_best = carry
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < cnt)
        def _():
            start_dma(k + 1, jax.lax.rem(k + 1, 2))

        blk = blbuf[k]
        s = pl.multiple_of(blk * (3 * tb), 8)
        pltpu.make_async_copy(ao_hbm.at[pl.ds(s, 3 * tb), :],
                              aobuf.at[slot], sem.at[slot, 0]).wait()
        pltpu.make_async_copy(ad_hbm.at[pl.ds(s, 3 * tb), :],
                              adbuf.at[slot], sem.at[slot, 1]).wait()
        ao = aobuf[slot]                        # (3tb, 4)
        ad = adbuf[slot]                        # (3tb, 3)
        aou, aov, aow = ao[0:tb], ao[tb:2 * tb], ao[2 * tb:]
        adu, adv, adw = ad[0:tb], ad[tb:2 * tb], ad[2 * tb:]

        def affine(m):
            return (m[:, 0:1] * ox + m[:, 1:2] * oy + m[:, 2:3] * oz
                    + m[:, 3:4] * ow)

        def linear(m):
            return m[:, 0:1] * dx + m[:, 1:2] * dy + m[:, 2:3] * dz

        qu, qv, qw = affine(aou), affine(aov), affine(aow)
        ru, rv, rw = linear(adu), linear(adv), linear(adw)
        rw_ok = jnp.abs(rw) >= 1e-12
        rw_safe = jnp.where(rw_ok, rw, 1e-12)
        t = -qw / rw_safe
        u = qu + t * ru
        v = qv + t * rv
        beps = 1e-5
        ok = (rw_ok & (u >= -beps) & (v >= -beps) & (u + v <= 1.0 + beps)
              & (t > t_min) & (t < t_best) & (t < tmax))
        t_m = jnp.where(ok, t, jnp.float32(INF))
        bt = jnp.min(t_m, axis=0, keepdims=True)
        rows = jax.lax.broadcasted_iota(jnp.int32, (tb, rb), 0
                                        ).astype(jnp.float32)
        sel = t_m <= bt
        ridx = jnp.min(jnp.where(sel, rows, jnp.float32(tb)), axis=0,
                       keepdims=True)
        first = rows == ridx
        bu = jnp.sum(jnp.where(first, u, 0.0), axis=0, keepdims=True)
        bv = jnp.sum(jnp.where(first, v, 0.0), axis=0, keepdims=True)
        closer = bt < t_best
        base = (blk * tb).astype(jnp.float32)
        return (jnp.where(closer, bt, t_best),
                jnp.where(closer, base + ridx, tri_best),
                jnp.where(closer, bu, u_best),
                jnp.where(closer, bv, v_best))

    init = (jnp.full((1, rb), jnp.float32(INF), jnp.float32),
            jnp.full((1, rb), -1.0, jnp.float32),
            jnp.zeros((1, rb), jnp.float32),
            jnp.zeros((1, rb), jnp.float32))

    def w_cond(st):
        k, (_t, tri_b, _u, _v) = st
        go = k < cnt
        if any_hit:
            go = go & jnp.any((tri_b < 0.0) & (tmax > t_min))
        return go

    def w_body(st):
        k, carry = st
        return k + 1, visit(k, carry)

    _, (t_best, tri_best, u_best, v_best) = jax.lax.while_loop(
        w_cond, w_body, (jnp.int32(0), init))
    t_ref[:, :] = t_best
    tri_ref[:, :] = tri_best
    u_ref[:, :] = u_best
    v_ref[:, :] = v_best


def intersect_culled_pallas(woop, org, d, t_min=1e-4, t_max=None,
                            any_hit: bool = False, interpret: bool = False,
                            block_lists=None):
    """Cluster-culled streaming intersector for large scenes. The XLA side
    computes a conservative per-chunk active-block list (beam vs cluster
    spheres at CULL_TB granularity); the kernel walks only those blocks,
    double-buffering their 5 KB transform DMAs behind the intersection
    math. This is the software TLAS: visits scale with what each coherent
    ray chunk can actually see, not with scene size.

    block_lists: optional (blist (nrb, C) i32 active-first, count (nrb,))
    computed by the caller (the rasterizer's exact screen-rect binning,
    renderers/raster.py) replacing the beam cull. Ray padding must already
    match CULL_RAY_BLOCK chunks."""
    import functools as _ft

    rtot = org.shape[0]
    ttot = woop["a_d"].shape[0] // 3
    tb = CULL_TB
    assert ttot % tb == 0, "pad triangles to CULL_TB"
    nt = ttot // tb

    if t_max is None:
        t_max = jnp.full((rtot,), INF, jnp.float32)
    else:
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (rtot,))
    rb = CULL_RAY_BLOCK
    rpad = (-rtot) % rb
    if rpad:
        org = jnp.concatenate([org, jnp.zeros((rpad, 3))], axis=0)
        d = jnp.concatenate([d, jnp.ones((rpad, 3))], axis=0)
        t_max = jnp.concatenate([t_max, jnp.zeros((rpad,))], axis=0)
    r = org.shape[0]
    nrb = r // rb

    if block_lists is not None:
        blist, count = block_lists
        assert blist.shape[0] == nrb and count.shape[0] == nrb, (
            blist.shape, count.shape, nrb)
    else:
        blist, count = _active_blocks(woop, org, d, t_max, nrb, rb)
    nt_pad = -(-nt // 128) * 128
    if nt_pad != nt:
        blist = jnp.pad(blist, ((0, 0), (0, nt_pad - nt)))
    blist = blist.reshape(-1)                       # flat (nrb * nt_pad,)

    o_t = jnp.concatenate([org, jnp.ones((r, 1))], axis=-1).T     # (4, R)
    d_t = d.T
    ao = woop["a_o"].reshape(3, ttot, 4)
    ad = woop["a_d"].reshape(3, ttot, 3)
    ao_blk = (ao.reshape(3, nt, tb, 4).transpose(1, 0, 2, 3)
              .reshape(nt * 3 * tb, 4))
    ad_blk = (ad.reshape(3, nt, tb, 3).transpose(1, 0, 2, 3)
              .reshape(nt * 3 * tb, 3))
    tmax2 = t_max.reshape(1, r)

    kernel = _ft.partial(_kernel_culled, t_min=float(t_min), any_hit=any_hit)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb,),
        in_specs=[
            pl.BlockSpec((4, rb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, rb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),      # blist (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),      # ao (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),      # ad (HBM)
        ],
        out_specs=[pl.BlockSpec((1, rb), lambda i, *_: (0, i),
                                memory_space=pltpu.VMEM)] * 4,
        scratch_shapes=[
            pltpu.SMEM((nt_pad,), jnp.int32),
            pltpu.VMEM((2, 3 * tb, 4), jnp.float32),
            pltpu.VMEM((2, 3 * tb, 3), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, r), jnp.float32)] * 4,
        interpret=interpret,
    )(count, o_t, d_t, tmax2, blist, ao_blk, ad_blk)

    t = t.reshape(-1)[:rtot]
    tri_f = tri.reshape(-1)[:rtot]
    tri_i = jnp.where(tri_f >= 0.0, tri_f.astype(jnp.int32), -1)
    return t, tri_i, u.reshape(-1)[:rtot], v.reshape(-1)[:rtot]


def intersect_brute_pallas(woop, org, d, t_min=1e-4, t_max=None,
                           any_hit: bool = False, interpret: bool = False):
    """Pallas twin of `woop.intersect_brute`. Returns (t, tri, u, v)."""
    rtot = org.shape[0]
    ttot = woop["a_d"].shape[0] // 3
    # adaptive triangle block: tiny scenes must not pay for a full 128-row
    # block of dead padded triangles (the kernel is VPU-compute-bound in
    # tris x rays — a 36-tri cornell box at tb=128 wastes 3.5x the work)
    tb = min(TRI_BLOCK, ttot)
    assert ttot % tb == 0, "pad triangles to a multiple of 8 (build_woop)"
    nt = ttot // tb

    if t_max is None:
        t_max = jnp.full((rtot,), INF, jnp.float32)
    else:
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (rtot,))
    rpad = (-rtot) % RAY_BLOCK
    if rpad:
        org = jnp.concatenate([org, jnp.zeros((rpad, 3))], axis=0)
        d = jnp.concatenate([d, jnp.ones((rpad, 3))], axis=0)
        t_max = jnp.concatenate([t_max, jnp.zeros((rpad,))], axis=0)
    r = org.shape[0]

    # lane-major layouts + regroup transform rows into per-block [u|v|w]
    o_t = jnp.concatenate([org, jnp.ones((r, 1))], axis=-1).T     # (4, R)
    d_t = d.T                                                     # (3, R)
    ao = woop["a_o"].reshape(3, ttot, 4)
    ad = woop["a_d"].reshape(3, ttot, 3)
    ao_blk = (ao.reshape(3, nt, tb, 4).transpose(1, 0, 2, 3)
              .reshape(nt * 3 * tb, 4))
    ad_blk = (ad.reshape(3, nt, tb, 3).transpose(1, 0, 2, 3)
              .reshape(nt * 3 * tb, 3))
    tmax2 = t_max.reshape(1, r)

    grid = (r // RAY_BLOCK,)
    out_shape = [jax.ShapeDtypeStruct((1, r), jnp.float32)] * 4
    kernel = functools.partial(_kernel, n_tri_blocks=nt, t_min=float(t_min),
                               tb=tb, any_hit=any_hit)
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),     # ao (whole table)
            pl.BlockSpec(memory_space=pltpu.VMEM),     # ad
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                                memory_space=pltpu.VMEM)] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(o_t, d_t, ao_blk, ad_blk, tmax2)

    t = t.reshape(-1)[:rtot]
    tri_f = tri.reshape(-1)[:rtot]
    tri_i = jnp.where(tri_f >= 0.0, tri_f.astype(jnp.int32), -1)
    return t, tri_i, u.reshape(-1)[:rtot], v.reshape(-1)[:rtot]
