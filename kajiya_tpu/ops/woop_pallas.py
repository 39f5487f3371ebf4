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
        # occlusion rays: this whole ray block parks as soon as every lane
        # has found SOME hit (no need for the closest one)
        def w_cond(st):
            k, (_t, tri_b, _u, _v) = st
            return (k < n_tri_blocks) & jnp.any(tri_b < 0.0)

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
    resident-table Pallas kernel; cluster-culled large scenes currently fall
    back to the XLA culled tracer (streamed Pallas kernel is the next step)."""
    if woop.get("cmin") is not None:
        from .woop import CULLED_RAY_BLOCK, intersect_brute

        return intersect_brute(woop, org, d, t_min=t_min, t_max=t_max,
                               any_hit=any_hit, ray_block=CULLED_RAY_BLOCK)
    return intersect_brute_pallas(woop, org, d, t_min=t_min, t_max=t_max,
                                  any_hit=any_hit)


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
