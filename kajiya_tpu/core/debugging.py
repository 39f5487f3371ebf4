"""Debug utilities: NaN guards, pass-output hooks, crash localization.

Role of the reference's crash markers + validation layers (SURVEY.md
section 5: `vulkan/error.rs:35-81` names the pass that killed the GPU;
`--graphics-debugging` turns on validation). On TPU device loss is not a
thing, but NaN/Inf poisoning of temporal state is the equivalent silent
killer: `check_finite` sweeps a FrameState and names the offending plane —
the crash-marker analog. `debug_view` is the GraphDebugHook analog: route
any intermediate output to the display slot.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def check_finite(state: dict, where: str = "") -> list[str]:
    """Host-side sweep: returns the names of non-finite planes (the 'last
    good pass' report). Call between frames when debugging."""
    bad = []
    for k, v in state.items():
        arr = np.asarray(v)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(k)
    return bad


def assert_finite(state: dict, where: str = ""):
    bad = check_finite(state, where)
    if bad:
        raise FloatingPointError(
            f"non-finite renderer state{' after ' + where if where else ''}: "
            f"{bad}")


def debug_view(outputs: dict, hook: str | None):
    """Route an intermediate buffer to the final image (GraphDebugHook,
    `kajiya-rg/src/graph.rs:592-657`). hook = output key, e.g. 'ssao',
    'shadow', 'diffuse_gi'. Returns an (H, W, 3) displayable array."""
    if not hook or hook not in outputs:
        return outputs["final"]
    img = outputs[hook]
    if isinstance(img, dict):      # gbuffer sub-dict: show albedo
        img = img.get("albedo", next(iter(img.values())))
    img = jnp.asarray(img)
    if img.ndim == 2:
        img = jnp.repeat(img[..., None], 3, axis=-1)
    if img.shape[-1] > 3:
        img = img[..., :3]
    mx = jnp.maximum(jnp.percentile(img, 99.0), 1e-6)
    return jnp.clip(img / mx, 0.0, 1.0)
