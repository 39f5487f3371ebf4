"""Hot reload: pass-module edits re-trace the frame without restarting.

Role of the reference's shader hot-reload chain (`file.rs:120-146` watcher →
turbosloth invalidation → `pipeline_cache.rs:229-392` stale-pipeline
recompile): in this framework the "shaders" are the Python pass modules and
"pipeline compilation" is jit tracing, so hot reload = watch module files,
`importlib.reload` the edited ones, and rebuild the jitted frame closure.
Temporal state (the FrameState pytree) survives untouched, and a reload
that fails to compile keeps the app alive on the previous frame function
(`Renderer.draw`'s last-good fallback — `renderer.rs:466-497`)."""
from __future__ import annotations

import importlib
import os
import sys


class ModuleWatcher:
    """Polls mtimes of every loaded module under `package`; `poll()` reloads
    the changed ones (leaf modules first so package re-exports see fresh
    code) and reports their names."""

    def __init__(self, package: str = "kajiya_tpu"):
        self.package = package
        self._mtimes: dict[str, float] = {}
        self._scan(record_only=True)

    def _files(self):
        for name, mod in list(sys.modules.items()):
            if not (name == self.package
                    or name.startswith(self.package + ".")):
                continue
            f = getattr(mod, "__file__", None)
            if f and os.path.exists(f):
                yield name, f

    def _scan(self, record_only: bool = False):
        changed = []
        for name, f in self._files():
            try:
                m = os.stat(f).st_mtime
            except OSError:
                continue
            old = self._mtimes.get(name)
            self._mtimes[name] = m
            if not record_only and old is not None and m > old:
                changed.append(name)
        return changed

    def poll(self) -> list[str]:
        """Reload edited modules; returns their names (empty = no edits).
        Deepest modules reload first so parent packages re-import the fresh
        children. A module whose reload raises is reported but skipped —
        the caller keeps running on the old code."""
        changed = sorted(self._scan(), key=lambda n: -n.count("."))
        ok = []
        for name in changed:
            try:
                importlib.reload(sys.modules[name])
                ok.append(name)
            except Exception as e:  # noqa: BLE001 — syntax errors etc.
                import logging

                logging.getLogger("kajiya_tpu").error(
                    "hot reload of %s failed: %s: %s", name,
                    type(e).__name__, e)
        return ok
