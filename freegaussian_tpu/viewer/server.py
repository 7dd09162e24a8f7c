"""Interactive viewer: orbit camera + articulation sliders over HTTP.

Replaces the reference's viser-based training viewer + ViewerVec3 sliders
(freegaussian_controller.py:15-39; `vis: viewer` in config/*/base.yaml) with a
dependency-free stdlib server: the browser page drags an orbit camera and
moves per-attribute 3-vector sliders; every interaction fetches a freshly
rendered JPEG from the model (stage 1, or stage 2 driven through the control
field)."""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from ..data.cameras import Camera

_PAGE = """<!DOCTYPE html>
<html><head><title>freegaussian-tpu viewer</title><style>
body { background:#1a1d24; color:#ddd; font-family:sans-serif; margin:0; display:flex }
#view { flex:1; display:flex; align-items:center; justify-content:center }
img { max-width:100%; image-rendering:auto; cursor:grab }
#panel { width:260px; padding:16px; background:#232733 }
input[type=range] { width:100% }
label { font-size:12px; color:#9aa }
</style></head><body>
<div id="view"><img id="img" src="/render"/></div>
<div id="panel"><h3>freegaussian-tpu</h3><div id="sliders"></div>
<label>azimuth <input type="range" id="th" min="-3.14" max="3.14" step="0.02" value="0"></label>
<label>elevation <input type="range" id="ph" min="-1.4" max="1.4" step="0.02" value="0"></label>
<label>radius <input type="range" id="r" min="0.5" max="12" step="0.1" value="4"></label>
<label>time <input type="range" id="t" min="0" max="1" step="0.01" value="0"></label>
</div>
<script>
const img = document.getElementById('img');
let pending = false, dirty = false;
async function refresh() {
  if (pending) { dirty = true; return; }
  pending = true;
  const vals = [...document.querySelectorAll('#sliders input')].map(s => s.value);
  const q = new URLSearchParams({
    th: th.value, ph: ph.value, r: r.value, t: t.value, atrb: vals.join(',')
  });
  img.src = '/render?' + q + '&_=' + Date.now();
  await new Promise(res => { img.onload = res; img.onerror = res; });
  pending = false;
  if (dirty) { dirty = false; refresh(); }
}
fetch('/info').then(r => r.json()).then(info => {
  const holder = document.getElementById('sliders');
  for (let i = 0; i < info.num_attributes; i++) {
    for (const axis of ['x','y','z']) {
      const l = document.createElement('label');
      l.textContent = `attr ${i} ${axis}`;
      const s = document.createElement('input');
      s.type = 'range'; s.min = -10; s.max = 10; s.step = 0.1; s.value = 0;
      s.oninput = refresh;
      l.appendChild(s); holder.appendChild(l);
    }
  }
});
for (const id of ['th','ph','r','t']) document.getElementById(id).oninput = refresh;
</script></body></html>"""


def orbit_camera(
    theta: float, phi: float, radius: float, *, width: int, height: int,
    fx: float = 300.0, time: float = 0.0, target=(0.0, 0.0, 0.0),
) -> Camera:
    """OpenGL look-at-target camera on a sphere."""
    import jax.numpy as jnp

    target = np.asarray(target, np.float32)
    eye = target + radius * np.array(
        [np.cos(phi) * np.sin(theta), np.sin(phi), np.cos(phi) * np.cos(theta)],
        np.float32,
    )
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0, 1, 0], np.float32)
    right = np.cross(fwd, up)
    right = right / max(np.linalg.norm(right), 1e-8)
    true_up = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, true_up, -fwd, eye
    return Camera(
        c2w=jnp.asarray(c2w[:3]),
        fx=jnp.asarray(fx), fy=jnp.asarray(fx),
        cx=jnp.asarray(width / 2.0), cy=jnp.asarray(height / 2.0),
        time=jnp.asarray(time), width=width, height=height,
    )


def render_orbit_view(
    render_fn: Callable[[Camera, Optional[np.ndarray]], np.ndarray],
    theta: float, phi: float, radius: float,
    *, width: int = 480, height: int = 360, time: float = 0.0,
    atrb_values: Optional[np.ndarray] = None,
) -> bytes:
    """Render one orbit view to JPEG bytes."""
    import imageio.v2 as imageio

    cam = orbit_camera(theta, phi, radius, width=width, height=height, time=time)
    rgb = np.asarray(render_fn(cam, atrb_values))
    rgb8 = np.clip(rgb * 255, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    imageio.imwrite(buf, rgb8, format="jpeg")
    return buf.getvalue()


class ViewerServer:
    """render_fn(camera, atrb_values|None) -> (H, W, 3) float rgb."""

    def __init__(
        self,
        render_fn: Callable,
        *,
        num_attributes: int = 0,
        width: int = 480,
        height: int = 360,
        port: int = 7007,
    ):
        self.render_fn = render_fn
        self.num_attributes = num_attributes
        self.width = width
        self.height = height
        self.port = port
        self._lock = threading.Lock()
        self._httpd: Optional[ThreadingHTTPServer] = None

    def _handler(self):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def do_GET(self):
                url = urlparse(self.path)
                if url.path == "/":
                    body = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                elif url.path == "/info":
                    body = json.dumps(
                        {"num_attributes": viewer.num_attributes}
                    ).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                elif url.path == "/render":
                    q = parse_qs(url.query)
                    get = lambda k, d: float(q.get(k, [d])[0])
                    atrb = None
                    if viewer.num_attributes and q.get("atrb", [""])[0]:
                        flat = np.asarray(
                            [float(v) for v in q["atrb"][0].split(",")], np.float32
                        )
                        atrb = 0.1 * flat.reshape(viewer.num_attributes, 3)
                    with viewer._lock:
                        body = render_orbit_view(
                            viewer.render_fn,
                            get("th", 0.0), get("ph", 0.0), get("r", 4.0),
                            width=viewer.width, height=viewer.height,
                            time=get("t", 0.0), atrb_values=atrb,
                        )
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                else:
                    self.send_response(404)
                    body = b"not found"
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        return Handler

    def serve_forever(self):
        self._httpd = ThreadingHTTPServer(("0.0.0.0", self.port), self._handler())
        print(f"viewer at http://localhost:{self.port}")
        self._httpd.serve_forever()

    def start_background(self):
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        if self._httpd:
            self._httpd.shutdown()
