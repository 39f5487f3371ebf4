"""FrameState checkpoint/resume.

Role-extension of the reference's persistence story (SURVEY.md section 5):
kajiya only persists app state (`view_state.ron`) and treats the temporal
resource map as throwaway; on TPU the FrameState pytree IS the renderer
state, and making it checkpointable gives failure recovery + bit-exact
resume of temporal accumulation (reference PT included) for free.
"""
from __future__ import annotations

import os

import jax
import numpy as np


def save_state(state: dict, path: str):
    """Write a FrameState (flat dict of arrays) as .npz."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {k: np.asarray(v) for k, v in state.items()}
    np.savez(path, **flat)


def load_state(path: str, like: dict | None = None) -> dict:
    """Load a FrameState. When `like` is given, validates shapes/dtypes
    against it (resolution or config drift -> clear error, not garbage)."""
    import jax.numpy as jnp

    z = np.load(path)
    out = {k: jnp.asarray(z[k]) for k in z.files}
    if like is not None:
        missing = set(like) - set(out)
        extra = set(out) - set(like)
        if missing or extra:
            raise ValueError(
                f"checkpoint mismatch: missing={sorted(missing)} "
                f"extra={sorted(extra)}")
        for k in like:
            if out[k].shape != like[k].shape:
                raise ValueError(
                    f"checkpoint {k}: shape {out[k].shape} != "
                    f"expected {like[k].shape}")
    return out
