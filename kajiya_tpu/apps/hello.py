"""Minimal embedding example — parity with `crates/bin/hello/src/main.rs`:
build a scene, add a mesh + instance, run the frame loop, write a PNG."""
from __future__ import annotations

import numpy as np


def main():
    from ..core.camera import make_view_constants
    from ..frame import RenderConfig, Renderer, jitter_for_frame
    from ..scene.procedural import cornell_box

    scene = cornell_box()                       # ~ add_baked_mesh + instance
    r = Renderer(scene, RenderConfig(width=640, height=360))

    out = None
    for i in range(8):                          # ~ main_loop.run(|ctx| ...)
        view = make_view_constants(
            (0.0, 0.0, 2.4), (0.0, 0.0, -1.0), fov_y_deg=55.0,
            width=640, height=360, jitter=np.asarray(jitter_for_frame(i)))
        out = r.draw(view)

    from .view import save_png

    save_png("out/hello.png", np.asarray(out["final"]))
    print("wrote out/hello.png")


if __name__ == "__main__":
    main()
