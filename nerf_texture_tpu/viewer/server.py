"""HTTP viewer server: MJPEG stream + JSON control (stdlib only).

TPU-native replacement for the dearpygui window (nerf/gui.py): the
training host serves frames to any browser; controls map 1:1 to the
reference GUI's buttons/sliders.  Endpoints:

  GET  /            minimal HTML page (stream + key bindings)
  GET  /stream      MJPEG of the live render/train loop
  POST /control     {"action": name, ...kwargs} -> ViewerApp method
  GET  /status      training state, frame times, modes
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html><html><body style='background:#111;color:#eee'>
<h3>nerf_texture_tpu viewer</h3>
<img id='v' src='/stream' style='width:70%'>
<p>drag: orbit &middot; wheel: zoom &middot; t: toggle training &middot;
m: visual mode &middot; l: light mode</p>
<script>
const img = document.getElementById('v');
let drag = false, lx = 0, ly = 0;
const post = (b) => fetch('/control', {method: 'POST',
  body: JSON.stringify(b)});
img.onmousedown = e => {drag = true; lx = e.clientX; ly = e.clientY;};
window.onmouseup = () => drag = false;
window.onmousemove = e => {if (!drag) return;
  post({action: 'orbit', dx: e.clientX - lx, dy: e.clientY - ly});
  lx = e.clientX; ly = e.clientY;};
img.onwheel = e => post({action: 'scale', delta: e.deltaY > 0 ? -1 : 1});
window.onkeydown = e => {
  if (e.key == 't') post({action: 'toggle_training'});
  if (e.key == 'm') post({action: 'switch_visual_mode'});
  if (e.key == 'l') post({action: 'switch_light_mode'});};
</script></body></html>"""


def _encode_jpeg(img: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=85)
    return buf.getvalue()


def serve(app, host: str = "0.0.0.0", port: int = 7860,
          block: bool = True):
    """Run the viewer loop + HTTP server around a ViewerApp."""
    latest = {"jpeg": _encode_jpeg(np.zeros((64, 64, 3), np.uint8))}
    stop = threading.Event()

    def loop():
        while not stop.is_set():
            try:
                latest["jpeg"] = _encode_jpeg(app.frame())
            except Exception as e:   # keep serving on render errors
                print("[viewer] frame error:", e)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == "/":
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/stream":
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace; boundary=frame")
                self.end_headers()
                try:
                    while not stop.is_set():
                        jpg = latest["jpeg"]
                        self.wfile.write(b"--frame\r\nContent-Type: "
                                         b"image/jpeg\r\n\r\n")
                        self.wfile.write(jpg)
                        self.wfile.write(b"\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    pass
            elif self.path == "/status":
                body = json.dumps({
                    "training": app.training,
                    "steps_per_frame": app.train_ctrl.steps,
                    "downscale": app.res_ctrl.downscale,
                    "visual_mode": getattr(app.trainer, "visual_mode",
                                           "RGB"),
                    "metrics": {k: float(v) for k, v in
                                app.last_metrics.items()},
                }).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            if self.path != "/control":
                self.send_response(404)
                self.end_headers()
                return
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            action = req.pop("action", "")
            try:
                if action == "orbit":
                    app.camera.orbit(req.get("dx", 0), req.get("dy", 0))
                elif action == "scale":
                    app.camera.scale(req.get("delta", 0))
                elif action == "pan":
                    app.camera.pan(req.get("dx", 0), req.get("dy", 0))
                elif action == "toggle_training":
                    app.training = not app.training
                elif hasattr(app, action):
                    getattr(app, action)(**req)
                self.send_response(200)
                self.end_headers()
            except Exception as e:
                self.send_response(500)
                self.end_headers()
                self.wfile.write(str(e).encode())

    t = threading.Thread(target=loop, daemon=True)
    t.start()
    httpd = ThreadingHTTPServer((host, port), Handler)
    print(f"[viewer] serving on http://{host}:{port}")
    if block:
        try:
            httpd.serve_forever()
        finally:
            stop.set()
    return httpd, stop
