"""Weighted reservoir sampling (streaming RIS) as pure array functions.

Functional port of the reference's reservoir math
(`assets/shaders/inc/reservoir.hlsl:18-77`: `Reservoir1spp{payload, M, W,
w_sum}` with `update_with_stream`), the core of the ReSTIR GI/reflection
passes. On TPU a "reservoir texture" is a dict of planar arrays and the
stochastic update is an elementwise `where` — fully VPU-parallel.

Conventions (Bitterli et al. 2020 / the reference):
  * candidate with source pdf p and target value p_hat enters with
    w = p_hat / p  (or an externally supplied weight);
  * after streaming, the unbiased contribution weight is
    W = w_sum / (M * p_hat_selected).
Payloads are arbitrary pytrees of same-leading-shape arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init(lane_shape, payload_zero):
    """Reservoir dict with empty state. lane_shape e.g. (H, W)."""
    return {
        "payload": payload_zero,
        "w_sum": jnp.zeros(lane_shape, jnp.float32),
        "M": jnp.zeros(lane_shape, jnp.float32),
        "W": jnp.zeros(lane_shape, jnp.float32),
        "p_hat": jnp.zeros(lane_shape, jnp.float32),
    }


def _select(cond, a, b):
    def sel(x, y):
        c = cond
        while c.ndim < x.ndim:
            c = c[..., None]
        return jnp.where(c, x, y)

    return jax.tree_util.tree_map(sel, a, b)


def update(res, payload, w, p_hat, u, m: float = 1.0, mask=None):
    """Stream one candidate into the reservoir (`update_with_stream`).

    w: RIS weight of the candidate (p_hat / source_pdf).
    u: uniform [0,1) per lane. m: candidate's M (sample count).
    mask: lanes where the candidate exists. Returns new reservoir."""
    w = jnp.maximum(w, 0.0)
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
        m_eff = jnp.where(mask, m, 0.0)
    else:
        m_eff = jnp.full_like(w, m)
    w_sum = res["w_sum"] + w
    take = (u * w_sum < w) & (w > 0.0)
    new = {
        "payload": _select(take, payload, res["payload"]),
        "w_sum": w_sum,
        "M": res["M"] + m_eff,
        "p_hat": jnp.where(take, p_hat, res["p_hat"]),
    }
    new["W"] = contribution_weight(new)
    return new


def merge(res, other, p_hat_other_here, u, m_clamp=None, mask=None,
          w_scale=None):
    """Merge another reservoir in (spatial/temporal reuse). The neighbor's
    sample is re-evaluated with OUR target function (`p_hat_other_here`).
    Its RIS weight is p_hat * W_other * M_other (standard ReSTIR merge);
    the merged M adds the neighbor's (clamped) M.

    w_scale: optional extra factor on the RIS weight — the reconnection
    jacobian when the sample is shifted between surface points
    (`restir_spatial.hlsl`'s solid-angle density ratio)."""
    m_other = other["M"]
    if m_clamp is not None:
        m_other = jnp.minimum(m_other, m_clamp)
    w = jnp.maximum(p_hat_other_here * other["W"] * m_other, 0.0)
    if w_scale is not None:
        w = w * w_scale
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
        m_other = jnp.where(mask, m_other, 0.0)
    w_sum = res["w_sum"] + w
    take = (u * w_sum < w) & (w > 0.0)
    new = {
        "payload": _select(take, other["payload"], res["payload"]),
        "w_sum": w_sum,
        "M": res["M"] + m_other,
        "p_hat": jnp.where(take, p_hat_other_here, res["p_hat"]),
    }
    new["W"] = contribution_weight(new)
    return new


def contribution_weight(res):
    """Unbiased contribution weight W = w_sum / (M * p_hat)."""
    denom = res["M"] * res["p_hat"]
    return jnp.where(denom > 1e-8, res["w_sum"] / jnp.maximum(denom, 1e-8), 0.0)


def clamp_m(res, m_max):
    """History clamp (the reference caps temporal M to bound staleness)."""
    scale = jnp.minimum(m_max / jnp.maximum(res["M"], 1e-8), 1.0)
    out = dict(res)
    out["M"] = res["M"] * scale
    out["w_sum"] = res["w_sum"] * scale
    out["W"] = contribution_weight(out)
    return out
