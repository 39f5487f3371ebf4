"""Persistent XLA compilation cache for the frame programs.

The full 1080p hybrid frame is a single very large jitted DAG; its first
compile costs minutes on this stack. The reference amortizes shader
compilation through an on-disk `PipelineCache` (`pipeline_cache.rs:91`) —
this is the XLA analog: executables land in `cache/jit/` keyed by HLO
fingerprint, so every later process (bench runs, the driver's bench,
profiling tools, the view app) skips compilation for unchanged programs.

Call `enable()` before building any jitted frame. Safe to call twice.
"""
from __future__ import annotations

import os

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "cache", "jit")


def enable(cache_dir: str | None = None) -> str | None:
    import sys

    import jax

    path = cache_dir or _CACHE_DIR
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception as e:
        # cache is an optimization, never a hard dependency — but a silently
        # disabled cache costs minutes per run, so make the failure visible
        print(f"# jitcache disabled ({type(e).__name__}: {e})",
              file=sys.stderr)
        return None
    # cache everything that took noticeable time; entries are small
    # relative to the minutes-long frame compiles they save
    for knob, val in (("jax_persistent_cache_min_compile_time_secs", 2.0),
                      ("jax_persistent_cache_min_entry_size_bytes", 0)):
        try:
            jax.config.update(knob, val)
        except Exception:
            pass  # knob renamed/absent on some jax versions
    return path
