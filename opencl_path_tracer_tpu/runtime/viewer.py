"""Live browser viewer — the headless replacement for the reference's
GLUT window + CL/GL interop display (onDisplay main.cpp:1019-1039,
texture draw + swap).

Serves a single HTML page that shows the progressive framebuffer
(PNG polled at ~10 Hz) and forwards keyboard/mouse input to the
CameraController with the reference's bindings (WASD/QY fly, E/C zoom,
drag to look, +/- bounce depth, r realtime toggle). The render loop
runs in a background thread calling RenderEngine.frame() continuously —
the onIdle loop (main.cpp:1171-1241), with input-driven accumulation
resets.

Usage:
    ptx serve --scene cornell --size 512x512   # then open the URL
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from opencl_path_tracer_tpu.io.image import to_uint8
from opencl_path_tracer_tpu.runtime.engine import RenderEngine

_PAGE = """<!doctype html>
<html><head><title>ptx viewer</title><style>
body{margin:0;background:#111;color:#ddd;font:13px monospace;
     display:flex;flex-direction:column;align-items:center}
img{image-rendering:pixelated;margin-top:8px;outline:none}
#hud{padding:6px}
</style></head><body>
<div id="hud">loading…</div>
<img id="fb" tabindex="0" draggable="false">
<script>
const img = document.getElementById('fb');
const hud = document.getElementById('hud');
let dragging = false;
function send(ev, data) {
  fetch('/input', {method:'POST',
    body: JSON.stringify({ev: ev, ...data})});
}
window.addEventListener('keydown', e => {
  if (!e.repeat) send('keydown', {key: e.key}); e.preventDefault();});
window.addEventListener('keyup', e => {
  send('keyup', {key: e.key}); e.preventDefault();});
img.addEventListener('mousedown', e => {
  dragging = true; send('mousedown', {x: e.offsetX, y: e.offsetY});});
window.addEventListener('mouseup', e => {
  dragging = false; send('mouseup', {x: 0, y: 0});});
img.addEventListener('mousemove', e => {
  if (dragging) send('mousemove', {x: e.offsetX, y: e.offsetY});});
async function tick() {
  img.src = '/frame.png?' + Date.now();
  const r = await fetch('/stats');
  const s = await r.json();
  if (s.fullscreen) { img.style.width = '100vw'; img.style.height = 'auto'; }
  else { img.style.width = ''; img.style.height = ''; }
  if (s.error) { hud.textContent = 'RENDER ERROR: ' + s.error; return; }
  hud.textContent = `samples=${s.samples}  ` +
    `samples/s=${s.samples_per_sec.toFixed(2)}  ` +
    `iterations=${s.iterations}  realtime=${s.real_time}  ` +
    `denoise=${s.denoise}  ` +
    `[WASD/QY fly, drag look, E/C zoom, +/- bounces, R realtime, ` +
    `N denoise, SPACE fullscreen, ESC quit]`;
}
setInterval(tick, 100); tick();
</script></body></html>"""


class ViewerServer:
    def __init__(self, engine: RenderEngine, host: str = "127.0.0.1",
                 port: int = 8642) -> None:
        self.engine = engine
        self.host = host
        self.port = port
        self._lock = threading.Lock()
        self._frame_png: bytes = b""
        self._stop = threading.Event()
        self._httpd = None
        self.last_error: str | None = None
        # Viewer-level 'n' toggle (not a reference binding): display
        # frames through the à-trous denoiser (engine.denoised_image;
        # first use compiles the pass — one stalled frame).
        self.denoise = False

    # --- render thread (the onIdle loop) ---------------------------------
    def _render_loop(self) -> None:
        try:
            self._render_loop_inner()
        except Exception as exc:  # surface in /stats instead of dying mute
            import traceback
            self.last_error = (
                f"{type(exc).__name__}: {exc}"
            )
            traceback.print_exc()

    def _render_loop_inner(self) -> None:
        from opencl_path_tracer_tpu.io.image import write_png
        last = time.time()
        while not self._stop.is_set():
            if self.engine.controller.state.quit_requested:
                self.shutdown()  # ESC (main.cpp:1055-1058)
                return
            now = time.time()
            with self._lock:
                self.engine.frame(dt=now - last)
                img = (self.engine.denoised_image() if self.denoise
                       else self.engine.image())
            last = now
            buf = io.BytesIO()
            try:
                from PIL import Image
                Image.fromarray(to_uint8(img), "RGB").save(
                    buf, format="PNG"
                )
            except ImportError:
                import tempfile, os
                with tempfile.NamedTemporaryFile(
                    suffix=".png", delete=False
                ) as fh:
                    write_png(fh.name, img)
                    buf.write(open(fh.name, "rb").read())
                    os.unlink(fh.name)
            self._frame_png = buf.getvalue()

    def _handle_input(self, msg: dict) -> None:
        ctl = self.engine.controller
        ev = msg.get("ev")
        key = str(msg.get("key", "")).lower()
        with self._lock:
            if ev == "keydown":
                if key == "n":  # viewer-only: denoised display toggle
                    self.denoise = not self.denoise
                    return
                ctl.key_down(key)
            elif ev == "keyup":
                ctl.key_up(key)
            elif ev == "mousedown":
                ctl.mouse_button(True, int(msg["x"]), int(msg["y"]))
            elif ev == "mouseup":
                ctl.mouse_button(False)
            elif ev == "mousemove":
                ctl.mouse_motion(int(msg["x"]), int(msg["y"]))

    def shutdown(self) -> None:
        """Stop the render loop and the HTTP server (ESC path)."""
        self._stop.set()
        httpd = self._httpd
        if httpd is not None:
            threading.Thread(target=httpd.shutdown, daemon=True).start()

    def serve(self, block: bool = True):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, ctype, body: bytes):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path.startswith("/frame.png"):
                    self._send(200, "image/png", viewer._frame_png)
                elif self.path.startswith("/stats"):
                    eng = viewer.engine
                    st = eng.controller.state
                    body = json.dumps({
                        "samples": eng._sample_host,
                        "samples_per_sec":
                            eng.meter.last_samples_per_sec,
                        "iterations": st.iterations,
                        "real_time": st.real_time,
                        "fullscreen": st.fullscreen,
                        "denoise": viewer.denoise,
                        "error": viewer.last_error,
                    }).encode()
                    self._send(200, "application/json", body)
                else:
                    self._send(200, "text/html",
                               _PAGE.encode())

            def do_POST(self):
                if self.path == "/input":
                    n = int(self.headers.get("Content-Length", 0))
                    try:
                        msg = json.loads(self.rfile.read(n))
                        viewer._handle_input(msg)
                    except (ValueError, KeyError):
                        pass
                    self._send(200, "text/plain", b"ok")
                else:
                    self._send(404, "text/plain", b"")

        render_thread = threading.Thread(
            target=self._render_loop, daemon=True
        )
        render_thread.start()
        httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self._httpd = httpd
        print(f"ptx viewer at http://{self.host}:{self.port}/")
        if block:
            try:
                httpd.serve_forever()
            finally:
                self._stop.set()
        else:
            threading.Thread(
                target=httpd.serve_forever, daemon=True
            ).start()
            return httpd
