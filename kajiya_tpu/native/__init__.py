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
    src = os.path.join(_DIR, f"{name}.cpp")
    out = os.path.join(_DIR, "_build", f"lib{name}.so")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        cmd = ["g++", "-O2", "-march=native", "-shared", "-fPIC",
               "-std=c++17", src, "-o", out]
        subprocess.run(cmd, check=True, capture_output=True)
    return out


def load(name: str) -> ctypes.CDLL:
    with _LOCK:
        if name not in _LIBS:
            _LIBS[name] = ctypes.CDLL(_build(name))
        return _LIBS[name]
