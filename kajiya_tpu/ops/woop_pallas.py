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
                           any_hit: bool = False, rb: int | None = None):
    """Scene-level entry used by rt.trace on TPU. Small scenes run the
    resident-table kernel; larger scenes run the cluster-culled streaming
    kernel (per-chunk active-block lists + double-buffered block DMA).
    `rb` overrides the culled kernel's rays-per-chunk (sorted divergent
    wavefronts cull much tighter with fine chunks; see ops/raysort.py)."""
    if woop.get("cmin") is not None:
        return intersect_culled_pallas(woop, org, d, t_min=t_min,
                                       t_max=t_max, any_hit=any_hit, rb=rb)
    return intersect_brute_pallas(woop, org, d, t_min=t_min, t_max=t_max,
                                  any_hit=any_hit)


# ----------------------------------------------------------------------------
# Cluster-culled streaming tracer (the software TLAS+BLAS traversal for
# scenes beyond VMEM residency; replaces the reference's hardware TraceRay
# for battle/diorama-class meshes, `vulkan/ray_tracing.rs`)
# ----------------------------------------------------------------------------

CULL_TB = 128           # triangles per culled block = the lane width: the
                        # streamed coefficient tables store 128 tris per row
                        # so every manual DMA slice is (8,128)-tile aligned
                        # (current libtpu's Mosaic rejects unaligned
                        # memref_slice shapes)
CULL_ROWS = 24          # 12 a_o + 9 a_d coefficient rows, padded to 8n
CULL_RAY_BLOCK = 512    # rays per chunk: (rb, 128) f32 intermediates live
                        # on the kernel's VMEM stack — 2048 blew the 16 MiB
                        # scoped limit (18.8M), 1024 still OOMed at scene
                        # scale (17.3M); finer chunks cull tighter anyway
CULL_PREFETCH = 8       # block-DMA pipeline depth: at depth 2 a visit cost
                        # 9.6 us against ~1.5 us of VPU math (measured,
                        # tools/culled_cost_model.py) — the 12 KB coefficient
                        # DMAs must be many-deep to hide issue+HBM latency


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
    # live-masked origin / direction AABBs for the reach-box test: even a
    # "divergent" chunk (fails the cone) is direction-BOUNDED under the
    # mixed-radix sort key, and the box exploits exactly that.
    big = jnp.float32(3e38)
    omin = jnp.min(jnp.where(live[..., None], o, big), axis=1)
    omax = jnp.max(jnp.where(live[..., None], o, -big), axis=1)
    dmin = jnp.min(jnp.where(live[..., None], dd, 1.0), axis=1)
    dmax = jnp.max(jnp.where(live[..., None], dd, -1.0), axis=1)
    return oc, ro, axis, cosh, tmax_c, coherent, (omin, omax, dmin, dmax)


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
    (oc, ro, axis, cosh, tmax_c, coherent,
     (omin, omax, dmin, dmax)) = _chunk_beams(org, d, tmax, nrb, rb)

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
    # directional reach box, applied to EVERY chunk: the chunk's rays can
    # only reach origin_aabb (+) tmax * dir_aabb (Minkowski), so a block
    # whose (sphere-inflated) bounds miss that box is dead regardless of
    # the cone/sphere verdict. Strictly conservative: per-axis the segment
    # o + s*d stays within [omin + tmax*min(dmin,0), omax + tmax*max(dmax,0)].
    reach_min = omin + tmax_c[:, None] * jnp.minimum(dmin, 0.0)  # (nrb, 3)
    reach_max = omax + tmax_c[:, None] * jnp.maximum(dmax, 0.0)
    box_hit = jnp.all(
        (cmax[None] >= reach_min[:, None, :])
        & (cmin[None] <= reach_max[:, None, :]), axis=-1)
    hit = ((rbnd[None, :] >= 0.0) & box_hit
           & jnp.where(coherent[:, None], cone_hit, sphere_hit))
    # conservative lower bound of any chunk ray's t into the block: lets
    # the kernel stop once every live ray's best hit is closer (classic
    # front-to-back traversal). Miss rays keep t_best = INF and disable it.
    dlb = jnp.maximum(dist - rr, 0.0)
    return sort_blocks_by_distance(hit, dlb)


def sort_blocks_by_distance(hit, dlb):
    """(hit (n, C) bool, dlb (n, C) f32) -> (blist, dist, count): active
    blocks first, ordered front-to-back by their conservative t lower
    bound; inactive tail carries +INF distance."""
    dkey = jnp.where(hit, dlb, jnp.float32(INF))
    iota = jax.lax.broadcasted_iota(jnp.int32, hit.shape, 1)
    dist_sorted, blist = jax.lax.sort((dkey, iota), dimension=1,
                                      num_keys=1)
    count = hit.sum(axis=1).astype(jnp.int32)
    return blist.astype(jnp.int32), dist_sorted, count


def _kernel_culled(count_ref, rays_ref, blist_hbm, bdist_hbm,
                   coef_hbm, out_ref,
                   blbuf, bdbuf, cbuf, blsem, bdsem, sem, *, t_min: float,
                   any_hit: bool, early_stop: bool):
    """Ray-sublane x tri-lane orientation: each visited block's 21
    coefficient rows arrive as ONE (CULL_ROWS, 128) DMA — minor dim = the
    128-tri lane width, so every manual memref_slice is (8,128)-tile
    aligned (current libtpu Mosaic enforces this). Intermediates are
    (rb, 128) outer products; the closest-hit select reduces across lanes.

    Per-ray I/O is LANE-MAJOR at the HLO boundary — one packed (8, rb)
    input [o.xyz, 1, d.xyz, tmax] and one (4, rb) output [t, tri, u, v] —
    because XLA lays a (R, 4)/(R, 1) pallas operand out in (8, 128) tiles
    with the NARROW dim on lanes: 32-128x padding, 3.6 KB of HBM temp per
    ray, 7.5 GB at a 1080p wavefront (the diorama OOM). The kernel
    transposes the 16 KB bundle to ray-sublane once per chunk."""
    rb = rays_ref.shape[1]
    tb = CULL_TB
    i = pl.program_id(0)
    cnt = count_ref[i]

    # fetch this chunk's active-block row (flat in HBM; padded so every
    # slice start/length is a multiple of the (1024,) i32 tile)
    ntp = blbuf.shape[0]
    row = pl.multiple_of(i * ntp, 1024)
    bl_dma = pltpu.make_async_copy(
        blist_hbm.at[pl.ds(row, ntp)], blbuf, blsem)
    bl_dma.start()
    bd_dma = pltpu.make_async_copy(
        bdist_hbm.at[pl.ds(row, ntp)], bdbuf, bdsem)
    bd_dma.start()
    bl_dma.wait()
    bd_dma.wait()

    def start_dma(k_idx, slot):
        blk = blbuf[k_idx]
        s = pl.multiple_of(blk * CULL_ROWS, 8)
        pltpu.make_async_copy(coef_hbm.at[pl.ds(s, CULL_ROWS), :],
                              cbuf.at[slot], sem.at[slot]).start()

    def wait_dma(k_idx, slot):
        blk = blbuf[k_idx]
        s = pl.multiple_of(blk * CULL_ROWS, 8)
        pltpu.make_async_copy(coef_hbm.at[pl.ds(s, CULL_ROWS), :],
                              cbuf.at[slot], sem.at[slot]).wait()

    # prime the pipeline D-1 deep (blocks 0..D-2); every visit k then tops
    # it up with block k+D-1 into the slot freed at visit k-1, keeping D
    # block fetches in flight ahead of the math
    D = CULL_PREFETCH
    jax.lax.fori_loop(
        0, jnp.minimum(jnp.int32(D - 1), cnt),
        lambda j, c: (start_dma(j, j), c)[1], 0)

    rt = rays_ref[:, :].T                 # (rb, 8): one 16 KB relayout
    ox, oy, oz, ow = (rt[:, 0:1], rt[:, 1:2], rt[:, 2:3], rt[:, 3:4])
    dx, dy, dz = rt[:, 4:5], rt[:, 5:6], rt[:, 6:7]
    tmax = rt[:, 7:8]                     # (rb, 1)

    def visit(k, carry):
        t_best, tri_best, u_best, v_best = carry
        slot = jax.lax.rem(k, D)

        @pl.when(k + D - 1 < cnt)
        def _():
            start_dma(k + D - 1, jax.lax.rem(k + D - 1, D))

        wait_dma(k, slot)
        blk = blbuf[k]
        c = cbuf[slot]                    # (CULL_ROWS, 128)

        def affine(r0):                   # rows r0..r0+3 = one a_o row
            return (c[r0:r0 + 1] * ox + c[r0 + 1:r0 + 2] * oy
                    + c[r0 + 2:r0 + 3] * oz + c[r0 + 3:r0 + 4] * ow)

        def linear(r0):                   # rows r0..r0+2 = one a_d row
            return (c[r0:r0 + 1] * dx + c[r0 + 1:r0 + 2] * dy
                    + c[r0 + 2:r0 + 3] * dz)

        qu, qv, qw = affine(0), affine(4), affine(8)      # (rb, tb)
        ru, rv, rw = linear(12), linear(15), linear(18)
        rw_ok = jnp.abs(rw) >= 1e-12
        rw_safe = jnp.where(rw_ok, rw, 1e-12)
        t = -qw / rw_safe
        u = qu + t * ru
        v = qv + t * rv
        beps = 1e-5
        ok = (rw_ok & (u >= -beps) & (v >= -beps) & (u + v <= 1.0 + beps)
              & (t > t_min) & (t < t_best) & (t < tmax))
        t_m = jnp.where(ok, t, jnp.float32(INF))
        bt = jnp.min(t_m, axis=1, keepdims=True)          # (rb, 1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (rb, tb), 1
                                         ).astype(jnp.float32)
        sel = t_m <= bt
        lidx = jnp.min(jnp.where(sel, lanes, jnp.float32(tb)), axis=1,
                       keepdims=True)
        first = lanes == lidx
        bu = jnp.sum(jnp.where(first, u, 0.0), axis=1, keepdims=True)
        bv = jnp.sum(jnp.where(first, v, 0.0), axis=1, keepdims=True)
        closer = bt < t_best
        base = (blk * tb).astype(jnp.float32)
        return (jnp.where(closer, bt, t_best),
                jnp.where(closer, base + lidx, tri_best),
                jnp.where(closer, bu, u_best),
                jnp.where(closer, bv, v_best))

    init = (jnp.full((rb, 1), jnp.float32(INF), jnp.float32),
            jnp.full((rb, 1), -1.0, jnp.float32),
            jnp.zeros((rb, 1), jnp.float32),
            jnp.zeros((rb, 1), jnp.float32))

    def w_cond(st):
        k, (t_b, tri_b, _u, _v) = st
        go = k < cnt
        if any_hit:
            go = go & jnp.any((tri_b < 0.0) & (tmax > t_min))
        elif early_stop:
            # front-to-back early stop: blocks arrive sorted by their
            # conservative t lower bound; once every ray's best hit is
            # closer than anything remaining, stop. Miss rays hold
            # t_best = INF (clamped by tmax) and keep the loop alive.
            worst = jnp.max(jnp.minimum(t_b, tmax))
            go = go & (bdbuf[jnp.minimum(k, ntp - 1)] <= worst)
        return go

    def w_body(st):
        k, carry = st
        return k + 1, visit(k, carry)

    k_end, (t_best, tri_best, u_best, v_best) = jax.lax.while_loop(
        w_cond, w_body, (jnp.int32(0), init))

    # Early exits (front-to-back stop / any-hit park / immediately-false
    # cond) leave up to D-1 prefetched block DMAs in flight; they MUST be
    # drained or the next grid step reuses their buffers+semaphores and the
    # device wedges.
    jax.lax.fori_loop(
        k_end, jnp.minimum(cnt, k_end + D - 1),
        lambda j, c: (wait_dma(j, jax.lax.rem(j, D)), c)[1], 0)

    out_ref[:, :] = jnp.concatenate(
        [t_best, tri_best, u_best, v_best], axis=1).T    # (4, rb)


def intersect_culled_pallas(woop, org, d, t_min=1e-4, t_max=None,
                            any_hit: bool = False, interpret: bool = False,
                            block_lists=None, early_stop: bool = True,
                            rb: int | None = None):
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
    # Exact search-interval tightening: nothing exists beyond the scene
    # AABB, so each ray's tmax ends at its box-exit t (rays missing the box
    # die outright). This is what arms the front-to-back early stop: sky
    # rays would otherwise hold tmax=INF and force every chunk they share
    # to walk its whole block list. Padded cluster boxes are inverted
    # (+INF, -INF) and drop out of the min/max.
    smin = jnp.min(woop["cmin64"], axis=0)
    smax = jnp.max(woop["cmax64"], axis=0)
    deps = 1e-12
    dinv = 1.0 / jnp.where(jnp.abs(d) < deps,
                           jnp.where(d < 0, -deps, deps), d)
    ta = (smin[None] - org) * dinv
    tb_ = (smax[None] - org) * dinv
    tfar = jnp.maximum(ta, tb_).min(-1)
    tnear = jnp.maximum(jnp.minimum(ta, tb_).max(-1), 0.0)
    t_max = jnp.where(tfar >= tnear,
                      jnp.minimum(t_max, tfar * 1.001 + 1e-3), 0.0)
    rb = CULL_RAY_BLOCK if rb is None else rb
    assert rb % 8 == 0, "ray chunk must stay (8,128)-sublane aligned"
    rpad = (-rtot) % rb
    if rpad:
        org = jnp.concatenate([org, jnp.zeros((rpad, 3))], axis=0)
        d = jnp.concatenate([d, jnp.ones((rpad, 3))], axis=0)
        t_max = jnp.concatenate([t_max, jnp.zeros((rpad,))], axis=0)
    r = org.shape[0]
    nrb = r // rb

    if block_lists is not None:
        blist, bdist, count = block_lists
        assert blist.shape[0] == nrb and count.shape[0] == nrb, (
            blist.shape, count.shape, nrb)
    else:
        blist, bdist, count = _active_blocks(woop, org, d, t_max, nrb, rb)
    nt_pad = -(-nt // 1024) * 1024      # (1024,) i32 tile alignment
    if nt_pad != nt:
        blist = jnp.pad(blist, ((0, 0), (0, nt_pad - nt)))
        bdist = jnp.pad(bdist, ((0, 0), (0, nt_pad - nt)),
                        constant_values=INF)
    blist = blist.reshape(-1)                       # flat (nrb * nt_pad,)
    bdist = bdist.reshape(-1)

    # packed LANE-MAJOR per-ray bundle (see _kernel_culled docstring):
    # rows [ox, oy, oz, 1, dx, dy, dz, tmax] -> (8, R), dense (8,128) tiles
    rays = jnp.concatenate([org.T, jnp.ones((1, r)), d.T,
                            t_max.reshape(1, r)], axis=0)          # (8, R)
    # coefficient table, tri-lane-major: per block CULL_ROWS x 128 rows
    # [a_o u(4), v(4), w(4) | a_d u(3), v(3), w(3) | pad(3)] so each
    # block's stream is ONE tile-aligned (24, 128) DMA
    ao = woop["a_o"].reshape(3, ttot, 4).transpose(0, 2, 1)       # (3,4,T)
    ad = woop["a_d"].reshape(3, ttot, 3).transpose(0, 2, 1)       # (3,3,T)
    coef = jnp.concatenate([ao.reshape(12, nt, tb),
                            ad.reshape(9, nt, tb),
                            jnp.zeros((CULL_ROWS - 21, nt, tb),
                                      jnp.float32)], axis=0)
    coef = coef.transpose(1, 0, 2).reshape(nt * CULL_ROWS, tb)

    kernel = _ft.partial(_kernel_culled, t_min=float(t_min), any_hit=any_hit,
                         early_stop=early_stop)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb,),
        in_specs=[
            pl.BlockSpec((8, rb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),      # blist (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),      # bdist (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),      # coef (HBM)
        ],
        out_specs=pl.BlockSpec((4, rb), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((nt_pad,), jnp.int32),
            pltpu.SMEM((nt_pad,), jnp.float32),
            pltpu.VMEM((CULL_PREFETCH, CULL_ROWS, tb), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((CULL_PREFETCH,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, r), jnp.float32),
        interpret=interpret,
    )(count, rays, blist, bdist, coef)

    t = out[0, :rtot]
    tri_f = out[1, :rtot]
    tri_i = jnp.where(tri_f >= 0.0, tri_f.astype(jnp.int32), -1)
    return t, tri_i, out[2, :rtot], out[3, :rtot]


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
