"""Native (C++) host components, built lazily with the system toolchain.

The compute path is JAX/XLA/Pallas on TPU; these are the host-runtime pieces
the reference implements natively (acceleration-structure building inside
the Vulkan driver, C++ texture compressors): here a ctypes-wrapped .so,
compiled on first use and cached next to the sources.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}


def _build(name: str) -> str:
    """Compile (or reuse) lib{name}.so, keyed on a content hash of the
    source so stale binaries can never be used (git does not preserve
    mtimes; prebuilt .so files are not committed). -march=native is opt-in
    via KAJIYA_TPU_NATIVE_MARCH to keep binaries portable across hosts."""
    import hashlib

    src = os.path.join(_DIR, f"{name}.cpp")
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_DIR, "_build", f"lib{name}-{tag}.so")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if not os.path.exists(out):
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17"]
        march = os.environ.get("KAJIYA_TPU_NATIVE_MARCH")
        if march:
            cmd.append(f"-march={march}")
        cmd += [src, "-o", out]
        subprocess.run(cmd, check=True, capture_output=True)
    return out


def load(name: str) -> ctypes.CDLL:
    with _LOCK:
        if name not in _LIBS:
            _LIBS[name] = ctypes.CDLL(_build(name))
        return _LIBS[name]
