"""Live training viewer: browser-based orbit camera over HTTP.

Reference: utils/viser_utils.py + thirdparty/nerfview (a viser web viewer
with a render callback, a train-loop lock, and rays/sec accounting).
viser is not available in this environment, so this is a dependency-free
equivalent on http.server: the page polls /render with orbit-camera
parameters; the server calls the registered render callback (which jits a
panorama render) and streams PNG frames. The training loop brackets each
iteration with checkin()/checkout(), which both yields to pending render
requests and reports rays/sec like the reference
(utils/viser_utils.py:43-55).
"""

from __future__ import annotations

import io
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>gslidar_tpu viewer</title><style>
body { background:#111; color:#ddd; font-family:monospace }
img { image-rendering:pixelated; width:90vw }
</style></head><body>
<div>az <input id=az type=range min=-180 max=180 value=0>
 el <input id=el type=range min=-60 max=60 value=15>
 dist <input id=dist type=range min=2 max=80 value=25>
 frame <input id=frame type=range min=0 max=FRAME_MAX value=0>
 <span id=stat></span></div>
<img id=view>
<script>
async function tick() {
  const q = ['az','el','dist','frame'].map(k =>
      k + '=' + document.getElementById(k).value).join('&');
  const t0 = performance.now();
  const r = await fetch('/render?' + q);
  if (r.ok) {
    const b = await r.blob();
    document.getElementById('view').src = URL.createObjectURL(b);
    document.getElementById('stat').textContent =
        (performance.now() - t0).toFixed(0) + ' ms';
  }
  setTimeout(tick, 250);
}
tick();
</script></body></html>"""


class VisManager:
    """Train-loop-integrated viewer (reference utils/viser_utils.py)."""

    def __init__(self, cfg: dict, render_fn=None):
        self.cfg = cfg
        self.render_fn = render_fn
        self.lock = threading.Lock()
        self.iter_t0 = None
        self.rays_per_sec = 0.0
        self.pixels_per_step = cfg.get("pixels_per_step", 66 * 515)
        self.max_frame = int(cfg.get("max_frame", 1))
        self.server = None
        port = cfg.get("port", 8080)
        if cfg.get("enabled", True) and render_fn is not None:
            try:
                self._start_server(port)
            except OSError as e:
                print(f"[viewer] disabled (port {port}: {e})")

    # -- train-loop protocol (reference viser_utils.py:43-55) -------------
    def checkin(self):
        self.lock.acquire()
        self.iter_t0 = time.perf_counter()

    def checkout(self, iteration=None):
        if self.iter_t0 is not None:
            dt = max(time.perf_counter() - self.iter_t0, 1e-9)
            self.rays_per_sec = self.pixels_per_step / dt
        self.lock.release()

    # -- http -------------------------------------------------------------
    def _start_server(self, port: int):
        mgr = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                url = urlparse(self.path)
                if url.path == "/":
                    body = _PAGE.replace("FRAME_MAX",
                                         str(mgr.max_frame - 1)).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if url.path == "/render":
                    q = parse_qs(url.query)
                    get = lambda k, d: float(q.get(k, [d])[0])
                    png = mgr._render_png(get("az", 0), get("el", 15),
                                          get("dist", 25),
                                          int(get("frame", 0)))
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.end_headers()
                    self.wfile.write(png)
                    return
                self.send_response(404)
                self.end_headers()

        self.server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
        t = threading.Thread(target=self.server.serve_forever, daemon=True)
        t.start()
        print(f"[viewer] http://localhost:{port}")

    def _render_png(self, az, el, dist, frame) -> bytes:
        from PIL import Image
        c2w = _orbit_c2w(az, el, dist)
        with self.lock:                       # share the chip with training
            img = self.render_fn(c2w, frame)  # -> [3, H, W] float in [0,1]
        arr = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr.transpose(1, 2, 0)).save(buf, format="PNG")
        return buf.getvalue()


def _orbit_c2w(az_deg, el_deg, dist):
    az, el = np.deg2rad(az_deg), np.deg2rad(el_deg)
    cam = dist * np.array([np.cos(el) * np.sin(az), -np.sin(el),
                           np.cos(el) * np.cos(az)])
    fwd = -cam / (np.linalg.norm(cam) + 1e-9)
    right = np.cross([0.0, -1.0, 0.0], fwd)
    right /= np.linalg.norm(right) + 1e-9
    up = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, fwd, cam
    return c2w
