"""Headless viewer: render a scene to PNG frames (or a progressive PT image).

Role of `crates/bin/view` (CLI flags `view/src/opt.rs:6-43`; RON scenes
`scene.rs:1-19`): loads a .ron scene / .gltf mesh / a builtin procedural
scene, renders N frames of the hybrid pipeline (temporal passes converge
over frames) or the reference path tracer, and writes PNGs. Interactive
windowing is replaced by headless frame dumps — the idiomatic "presentation"
for a TPU pod (SURVEY.md section 2.7 item 1).

Usage:
  python -m kajiya_tpu.apps.view --scene cornell_box --width 640 --height 360
  python -m kajiya_tpu.apps.view --scene /path/scene.ron --frames 16 -o out
  python -m kajiya_tpu.apps.view --mode reference --spp 64 -o pt.png
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_scene(name_or_path: str):
    from ..scene import procedural

    if hasattr(procedural, name_or_path):
        return getattr(procedural, name_or_path)()
    if name_or_path.endswith(".ron"):
        from ..scene.scene import load_ron_scene

        return load_ron_scene(name_or_path)
    if name_or_path.endswith((".gltf", ".glb")):
        from ..scene.cache import load_mesh_cached
        from ..scene.scene import Scene

        scene = Scene()
        scene.add_instance(scene.add_mesh(load_mesh_cached(name_or_path)))
        return scene
    raise SystemExit(f"unknown scene: {name_or_path}")


def save_png(path: str, img: np.ndarray):
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--scene", default="cornell_box",
                   help="builtin name, .ron scene, or .gltf/.glb mesh")
    p.add_argument("--width", type=int, default=1280)      # opt.rs defaults
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--temporal-upsampling", type=float, default=1.0)
    p.add_argument("--mode", choices=("standard", "reference"),
                   default="standard")
    p.add_argument("--frames", type=int, default=8,
                   help="hybrid frames to accumulate before the final dump")
    p.add_argument("--spp", type=int, default=16, help="reference-mode spp")
    p.add_argument("--camera", type=float, nargs=6,
                   default=(0.0, 0.0, 2.4, 0.0, 0.0, -1.0),
                   metavar=("PX", "PY", "PZ", "DX", "DY", "DZ"))
    p.add_argument("--fov", type=float, default=55.0)
    p.add_argument("--debug-mode", default="none")
    p.add_argument("--ibl", default=None, help=".hdr environment map path")
    p.add_argument("--ev", type=float, default=0.0)
    p.add_argument("--dump-every", type=int, default=0,
                   help="if >0, write every Nth frame")
    p.add_argument("-o", "--output", default="out/frame.png")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from ..core.camera import make_view_constants
    from ..frame import (RenderConfig, Renderer, init_reference_state,
                         jitter_for_frame, render_frame_reference)

    scene = build_scene(args.scene)
    cfg = RenderConfig(width=args.width, height=args.height,
                       temporal_upsampling=args.temporal_upsampling,
                       debug_mode=args.debug_mode, ev_shift=args.ev)
    cam_pos, cam_dir = args.camera[:3], args.camera[3:]

    r = Renderer(scene, cfg, ibl=args.ibl)
    t_start = time.perf_counter()

    if args.mode == "reference":
        import jax

        state = init_reference_state(cfg)
        view = make_view_constants(cam_pos, cam_dir, fov_y_deg=args.fov,
                                   width=args.width, height=args.height)
        step = jax.jit(lambda s: render_frame_reference(
            r.ts, s, view, cfg, levels=r.levels))
        out = None
        for i in range(args.spp):
            state, out = step(state)
            if args.dump_every and (i + 1) % args.dump_every == 0:
                save_png(_seq_path(args.output, i), np.asarray(out["final"]))
        save_png(args.output, np.asarray(out["final"]))
    else:
        out = None
        for i in range(args.frames):
            view = make_view_constants(
                cam_pos, cam_dir, fov_y_deg=args.fov,
                width=args.width, height=args.height,
                jitter=np.asarray(jitter_for_frame(i)))
            out = r.draw(view)
            if args.dump_every and (i + 1) % args.dump_every == 0:
                save_png(_seq_path(args.output, i), np.asarray(out["final"]))
        save_png(args.output, np.asarray(out["final"]))

    dt = time.perf_counter() - t_start
    n = args.spp if args.mode == "reference" else args.frames
    print(f"wrote {args.output} ({n} frames in {dt:.1f}s, "
          f"{dt / max(n, 1) * 1e3:.0f} ms/frame incl. compile)")


def _seq_path(path: str, i: int) -> str:
    root, ext = os.path.splitext(path)
    return f"{root}_{i:04d}{ext}"


if __name__ == "__main__":
    main()
