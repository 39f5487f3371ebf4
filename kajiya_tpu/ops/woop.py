"""MXU brute-force ray-triangle intersection via Woop transforms.

The TPU-native answer to hardware TraceRay for small/medium triangle counts
(SURVEY.md hard part #1). Instead of a divergent BVH walk (gather-bound and
lockstep-stalled on the VPU), intersection is reformulated as dense matmuls:

  for each triangle precompute the affine map A into its barycentric frame
  (unit triangle in the w=0 plane). For a ray (o, d):
      q = A o + b   (origin part, affine)       r = A d   (direction part)
      t = -q_w / r_w,  u = q_u + t r_u,  v = q_v + t r_v
  Hit iff u >= 0, v >= 0, u + v <= 1, t in (t_min, t_max).

  Batched over R rays x T triangles, (q, r) are TWO MATMULS:
      (R, 4) @ (4, 3T)  and  (R, 3) @ (3, 3T)
  which the MXU eats at speed-of-light. A scan over triangle blocks keeps a
  running closest-hit so nothing R x T ever materializes — the
  flash-attention pattern applied to visibility.

Cost is 48*R*T flops: optimal for T up to a few thousand (every scene pass
of the cornell/mini-diorama class); larger scenes use the cluster-culled
tracer built on the same kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

INF = jnp.float32(1e30)

TRI_BLOCK = 256     # triangles per inner matmul block
RAY_BLOCK = 8192    # rays per outer chunk
CULLED_RAY_BLOCK = 8192   # 64x128 screen tiles (smaller chunks measured slower: per-chunk overhead beats the tighter frustum)


def build_woop(v0, e1, e2, pad_to: int | None = None):
    """Per-triangle barycentric-frame transforms.

    Returns dict with:
      a_d: (3T, 3)  direction transform rows (u, v, w stacked per tri)
      a_o: (3T, 4)  origin transform rows (affine, includes -A v0)
      valid: (T,) mask of non-degenerate triangles
    Rows are grouped as [u_rows | v_rows | w_rows] blocks of T for coalesced
    reshaping after the matmul.
    """
    t = v0.shape[0]
    n = jnp.cross(e1, e2)
    m = jnp.stack([e1, e2, n], axis=-1)              # (T, 3, 3) columns
    det = jnp.linalg.det(m)
    valid = jnp.abs(det) > 1e-18
    safe_m = jnp.where(valid[:, None, None], m, jnp.eye(3))
    inv = jnp.linalg.inv(safe_m)                     # (T, 3, 3) rows: u,v,w
    inv = jnp.where(valid[:, None, None], inv, 0.0)
    b = -jnp.einsum("tij,tj->ti", inv, v0)           # (T, 3)

    if pad_to is not None and pad_to > t:
        pad = pad_to - t
        inv = jnp.concatenate([inv, jnp.zeros((pad, 3, 3))], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad, 3))], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)
        t = pad_to

    # (T, 3, 3) -> (3T, 3) grouped by row kind: [all u rows; all v; all w]
    a_d = jnp.concatenate([inv[:, 0, :], inv[:, 1, :], inv[:, 2, :]], axis=0)
    a_o = jnp.concatenate(
        [jnp.concatenate([inv[:, k, :], b[:, k:k + 1]], axis=-1)
         for k in range(3)], axis=0)                 # (3T, 4)
    return {"a_d": a_d, "a_o": a_o, "valid": valid}


def _intersect_block(o_aug, d, a_o_blk, a_d_blk, valid_blk, t_min, t_max,
                     cur_t, cur_tri, cur_u, cur_v, tri_base, any_hit):
    """One (RB rays) x (TB tris) block. a_*_blk rows grouped [u|v|w] x TB."""
    tb = valid_blk.shape[0]
    # HIGHEST: the MXU's default bf16 passes shift borderline hits by up to
    # ~1e-3 relative — enough to open cracks on shared edges (measured:
    # 47/65536 diorama primaries disagreed with the exact VPU kernel,
    # tools/check_culled_onchip.py); ray transforms must be exact f32
    q = jnp.dot(o_aug, a_o_blk.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    r = jnp.dot(d, a_d_blk.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    qu, qv, qw = q[:, :tb], q[:, tb:2 * tb], q[:, 2 * tb:]
    ru, rv, rw = r[:, :tb], r[:, tb:2 * tb], r[:, 2 * tb:]

    rw_safe = jnp.where(jnp.abs(rw) < 1e-12, 1e-12, rw)
    t = -qw / rw_safe
    u = qu + t * ru
    v = qv + t * rv
    # small barycentric slack closes FP cracks along shared edges (visible
    # as speckles on large meshes; tiny overlap is harmless for rendering)
    beps = 1e-5
    ok = ((jnp.abs(rw) >= 1e-12) & valid_blk[None, :]
          & (u >= -beps) & (v >= -beps) & (u + v <= 1.0 + beps)
          & (t > t_min) & (t < cur_t[:, None]) & (t < t_max[:, None]))
    t_masked = jnp.where(ok, t, INF)
    best = jnp.argmin(t_masked, axis=-1)
    rows = jnp.arange(t_masked.shape[0])
    bt = t_masked[rows, best]
    closer = bt < cur_t
    new_t = jnp.where(closer, bt, cur_t)
    new_tri = jnp.where(closer, tri_base + best, cur_tri)
    new_u = jnp.where(closer, u[rows, best], cur_u)
    new_v = jnp.where(closer, v[rows, best], cur_v)
    return new_t, new_tri.astype(jnp.int32), new_u, new_v


def build_clusters(v0, e1, e2, pad_to: int, tri_block: int = TRI_BLOCK):
    """Per-block AABBs over the Morton-ordered triangle blocks — the coarse
    level of the culled tracer. Returns (cmin, cmax): (C, 3) each. Padded
    (dead) triangles collapse to empty boxes."""
    t = v0.shape[0]
    p1, p2 = v0 + e1, v0 + e2
    tmin = jnp.minimum(jnp.minimum(v0, p1), p2)
    tmax = jnp.maximum(jnp.maximum(v0, p1), p2)
    pad = pad_to - t
    if pad:
        tmin = jnp.concatenate([tmin, jnp.full((pad, 3), INF)], axis=0)
        tmax = jnp.concatenate([tmax, jnp.full((pad, 3), -INF)], axis=0)
    c = pad_to // tri_block
    return (tmin.reshape(c, tri_block, 3).min(axis=1),
            tmax.reshape(c, tri_block, 3).max(axis=1))


def intersect_brute(woop, org, d, t_min=1e-4, t_max=None, any_hit=False,
                    tri_block: int = TRI_BLOCK, ray_block: int = RAY_BLOCK,
                    chunk_cluster_mask=None):
    """Closest-hit over ALL triangles. org/d: (R, 3). Returns (t, tri, u, v)
    with t = INF / tri = -1 on miss. t_max may be scalar or (R,).

    When the woop dict carries cluster bounds ("cmin"/"cmax", see
    build_clusters), each ray chunk first tests the cluster AABBs and whole
    triangle blocks no ray in the chunk can hit are SKIPPED via a scalar
    branch — the TPU-native 'traversal': coherent chunks visit only the
    handful of blocks their frustum touches, and the inner loop stays dense
    matmul work (the stream-tracing formulation for wide-SIMD machines).

    chunk_cluster_mask: optional (n_ray_chunks, C) bool — a caller-computed
    active-block mask replacing the in-chunk slab test (the rasterizer bins
    blocks by exact screen-rect overlap, renderers/raster.py)."""
    rtot = org.shape[0]
    ttot3 = woop["a_d"].shape[0]
    ttot = ttot3 // 3
    tri_block = min(tri_block, ttot)    # small scenes pad to 8, not 256
    nt = ttot // tri_block if ttot % tri_block == 0 else -1
    assert nt > 0, "pad triangle count to a multiple of tri_block"

    if t_max is None:
        t_max = jnp.full((rtot,), INF, jnp.float32)
    else:
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (rtot,))

    # pad rays to ray_block
    rpad = (-rtot) % ray_block
    if rpad:
        org = jnp.concatenate([org, jnp.zeros((rpad, 3))], axis=0)
        d = jnp.concatenate([d, jnp.ones((rpad, 3))], axis=0)
        t_max = jnp.concatenate([t_max, jnp.zeros((rpad,))], axis=0)
    r = org.shape[0]
    nrb = r // ray_block

    o_aug = jnp.concatenate([org, jnp.ones((r, 1))], axis=-1)

    # (3, T, ...) views for per-block slicing: regroup rows by block
    a_d = woop["a_d"].reshape(3, ttot, 3)
    a_o = woop["a_o"].reshape(3, ttot, 4)
    valid = woop["valid"]

    have_clusters = "cmin" in woop and woop.get("cmin") is not None

    def ray_chunk(carry, inputs):
        if chunk_cluster_mask is not None:
            o_blk, d_blk, tmax_blk, cluster_mask = inputs
        else:
            o_blk, d_blk, tmax_blk = inputs

        if chunk_cluster_mask is not None:
            pass
        elif have_clusters:
            # chunk-level cull: does ANY ray in this chunk enter cluster c?
            o3 = o_blk[:, :3]
            eps = 1e-12
            inv = 1.0 / jnp.where(jnp.abs(d_blk) < eps,
                                  jnp.where(d_blk < 0, -eps, eps), d_blk)
            t0 = (woop["cmin"][None] - o3[:, None]) * inv[:, None]  # (RB,C,3)
            t1 = (woop["cmax"][None] - o3[:, None]) * inv[:, None]
            tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
            tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
            hit_c = (tn <= tf) & (tf >= t_min) & (tn <= tmax_blk[:, None])
            cluster_mask = jnp.any(hit_c, axis=0)                   # (C,)
        else:
            cluster_mask = None

        def tri_step(st, i):
            def do(st):
                cur_t, cur_tri, cur_u, cur_v = st
                s = i * tri_block
                adb = jax.lax.dynamic_slice(a_d, (0, s, 0), (3, tri_block, 3)
                                            ).reshape(3 * tri_block, 3)
                aob = jax.lax.dynamic_slice(a_o, (0, s, 0), (3, tri_block, 4)
                                            ).reshape(3 * tri_block, 4)
                vb = jax.lax.dynamic_slice(valid, (s,), (tri_block,))
                return _intersect_block(o_blk, d_blk, aob, adb, vb, t_min,
                                        tmax_blk, cur_t, cur_tri, cur_u,
                                        cur_v, s, any_hit)

            # occlusion rays need ANY hit: once every live ray in the chunk
            # has one, the remaining blocks are skipped via the same scalar
            # branch as cluster culling (the any-hit early-out)
            need = None
            if any_hit:
                need = jnp.any((st[1] < 0) & (tmax_blk > t_min))
            if cluster_mask is None:
                if need is None:
                    return do(st), None
                return jax.lax.cond(need, do, lambda s_: s_, st), None
            pred = cluster_mask[i] if need is None else cluster_mask[i] & need
            return jax.lax.cond(pred, do, lambda s_: s_, st), None

        init = (jnp.full((ray_block,), INF, jnp.float32),
                jnp.full((ray_block,), -1, jnp.int32),
                jnp.zeros((ray_block,), jnp.float32),
                jnp.zeros((ray_block,), jnp.float32))
        (bt, btri, bu, bv), _ = jax.lax.scan(
            tri_step, init, jnp.arange(nt, dtype=jnp.int32))
        return carry, (bt, btri, bu, bv)

    inputs = (o_aug.reshape(nrb, ray_block, 4),
              d.reshape(nrb, ray_block, 3),
              t_max.reshape(nrb, ray_block))
    if chunk_cluster_mask is not None:
        assert chunk_cluster_mask.shape[0] == nrb, (
            chunk_cluster_mask.shape, nrb)
        inputs = inputs + (chunk_cluster_mask,)
    _, (t, tri, u, v) = jax.lax.scan(ray_chunk, 0, inputs)
    t = t.reshape(-1)[:rtot]
    tri = tri.reshape(-1)[:rtot]
    u = u.reshape(-1)[:rtot]
    v = v.reshape(-1)[:rtot]
    return t, tri, u, v
