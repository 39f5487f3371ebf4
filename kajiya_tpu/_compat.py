"""Small runtime/backend compatibility helpers."""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def default_cpu_if_eager():
    """Route eager (non-traced) array math to the CPU backend.

    Host-side setup math (camera matrices, scene flattening) must never run
    eagerly on the remote TPU: per-op dispatch is slow through the tunnel,
    and any resulting device->host readback permanently degrades the session
    to a synchronous ~41 ms/dispatch mode. Inside jit tracing this context is
    inert (tracers carry no device)."""
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        yield
        return
    with jax.default_device(cpu):
        yield
