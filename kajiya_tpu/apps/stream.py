"""Live viewer: MJPEG/PNG HTTP presentation of the interactive renderer.

Role of the reference's presentation layer — swapchain + winit window +
imgui toggles (`vulkan/swapchain.rs`, `kajiya-simple/src/main_loop.rs`,
`view/src/gui.rs`): a TPU box has no display, so the "swapchain" is an HTTP
endpoint any browser can watch. Frames render in a background loop
(camera orbit / sequencer optional) and are presented as a
multipart/x-mixed-replace stream; runtime toggles (debug modes = the
GraphDebugHook picker, exposure, sun) are plain query-parameter endpoints,
mirroring the imgui panel's knobs.

    python -m kajiya_tpu.apps.stream --scene cornell_box --port 8080
    # browser: http://host:8080/        (live view)
    #          /set?debug_mode=normals  (any RenderConfig debug mode)
    #          /set?ev=1.5              (exposure shift)
    #          /snap                    (single PNG of the latest frame)

The render loop and HTTP server are decoupled through a latest-frame
mailbox (the two-frame swapchain analog: the producer never blocks on a
slow consumer; watchers always get the newest completed frame).
"""
from __future__ import annotations

import argparse
import io
import threading
import time
from dataclasses import replace
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


class FrameMailbox:
    """Latest-frame handoff: producer overwrites, consumers wait for new."""

    def __init__(self):
        self._cond = threading.Condition()
        self._frame = None
        self._seq = 0

    def put(self, frame: np.ndarray):
        with self._cond:
            self._frame = frame
            self._seq += 1
            self._cond.notify_all()

    def get(self, last_seq: int, timeout: float = 5.0):
        with self._cond:
            self._cond.wait_for(lambda: self._seq != last_seq,
                                timeout=timeout)
            return self._frame, self._seq


def _encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def _encode_png(img: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "PNG")
    return buf.getvalue()


class ViewerState:
    """Mutable runtime toggles, applied between frames (imgui analog)."""

    def __init__(self, renderer, orbit: float = 0.0):
        self.renderer = renderer
        self.lock = threading.Lock()
        self.debug_mode = "none"
        self.ev = 0.0
        self.orbit = orbit          # rad/s camera orbit; 0 = static
        self.paused = False
        self.dirty = False

    def apply(self, params: dict) -> dict:
        from ..renderers import deferred

        out = {}
        with self.lock:
            if "debug_mode" in params:
                m = params["debug_mode"][0]
                if m in deferred.DEBUG_MODES:
                    self.debug_mode, self.dirty = m, True
                    out["debug_mode"] = m
                else:
                    out["error"] = f"unknown debug mode {m!r}"
                    out["known"] = sorted(deferred.DEBUG_MODES)
            if "ev" in params:
                self.ev = float(params["ev"][0])
                self.dirty = True
                out["ev"] = self.ev
            if "orbit" in params:
                self.orbit = float(params["orbit"][0])
                out["orbit"] = self.orbit
            if "paused" in params:
                self.paused = params["paused"][0] in ("1", "true")
                out["paused"] = self.paused
        return out


def render_loop(vs: ViewerState, mailbox: FrameMailbox, cam_pos, cam_dir,
                fov: float, stop: threading.Event):
    """Producer: renders frames forever, rebuilding the jitted frame when a
    static toggle changed (the compile-failure-tolerant Renderer.draw keeps
    presenting the last good frame on error)."""
    from ..core.camera import make_view_constants

    r = vs.renderer
    t0 = time.time()
    while not stop.is_set():
        if vs.paused:
            time.sleep(0.05)
            continue
        with vs.lock:
            if vs.dirty:
                r.cfg = replace(r.cfg, debug_mode=vs.debug_mode,
                                ev_shift=vs.ev)
                r.rebuild()
                vs.dirty = False
            orbit = vs.orbit
        pos = np.asarray(cam_pos, np.float64)
        fwd = np.asarray(cam_dir, np.float64)
        if orbit:
            a = orbit * (time.time() - t0)
            c, s = np.cos(a), np.sin(a)
            rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            pos = rot @ pos
            fwd = rot @ fwd
        view = make_view_constants(tuple(pos), tuple(fwd), fov_y_deg=fov,
                                   width=r.cfg.width, height=r.cfg.height)
        out = r.draw(view)
        img = np.asarray(out["final"])
        mailbox.put((np.clip(img, 0.0, 1.0) * 255).astype(np.uint8))


def make_handler(vs: ViewerState, mailbox: FrameMailbox):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):           # quiet
            pass

        def _json(self, obj, code=200):
            import json

            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib name)
            u = urlparse(self.path)
            if u.path == "/":
                self.send_response(200)
                self.send_header("Content-Type",
                                 "multipart/x-mixed-replace; boundary=frame")
                self.end_headers()
                seq = 0
                try:
                    while True:
                        frame, seq = mailbox.get(seq)
                        if frame is None:
                            continue
                        jpg = _encode_jpeg(frame)
                        self.wfile.write(b"--frame\r\n"
                                         b"Content-Type: image/jpeg\r\n\r\n")
                        self.wfile.write(jpg)
                        self.wfile.write(b"\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    return
            elif u.path == "/snap":
                frame, _ = mailbox.get(-1, timeout=30.0)
                if frame is None:
                    self._json({"error": "no frame yet"}, 503)
                    return
                png = _encode_png(frame)
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)
            elif u.path == "/set":
                self._json(vs.apply(parse_qs(u.query)))
            elif u.path == "/status":
                self._json({"debug_mode": vs.debug_mode, "ev": vs.ev,
                            "orbit": vs.orbit, "paused": vs.paused,
                            "last_error": vs.renderer._last_error})
            else:
                self._json({"error": "unknown path"}, 404)

    return Handler


def serve(renderer, cam_pos, cam_dir, fov=55.0, port=8080, orbit=0.0,
          block=True):
    """Start the render loop + HTTP server. Returns (server, stop_event)."""
    vs = ViewerState(renderer, orbit=orbit)
    mailbox = FrameMailbox()
    stop = threading.Event()
    t = threading.Thread(target=render_loop,
                         args=(vs, mailbox, cam_pos, cam_dir, fov, stop),
                         daemon=True)
    t.start()
    srv = ThreadingHTTPServer(("0.0.0.0", port), make_handler(vs, mailbox))
    if block:
        try:
            srv.serve_forever()
        finally:
            stop.set()
    else:
        st = threading.Thread(target=srv.serve_forever, daemon=True)
        st.start()
    return srv, stop


def main(argv=None):
    from .view import build_scene
    from ..frame import RenderConfig, Renderer

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--scene", default="cornell_box")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--camera", type=float, nargs=6,
                   default=(0.0, 0.0, 2.4, 0.0, 0.0, -1.0))
    p.add_argument("--fov", type=float, default=55.0)
    p.add_argument("--orbit", type=float, default=0.0,
                   help="camera orbit speed, rad/s")
    args = p.parse_args(argv)

    r = Renderer(build_scene(args.scene),
                 RenderConfig(width=args.width, height=args.height))
    print(f"serving http://0.0.0.0:{args.port}/  (/set /snap /status)")
    serve(r, args.camera[:3], args.camera[3:], fov=args.fov, port=args.port,
          orbit=args.orbit)


if __name__ == "__main__":
    main()
