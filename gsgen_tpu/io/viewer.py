"""Interactive web viewer for trained scenes.

Replaces the reference's viser-based viewer (utils/viewer/
viser_viewer.py:26-188 + vis.py in gsgen3d/gsgen) with a dependency-
free stdlib HTTP server: a small HTML page with orbit controls requests
``/render?azimuth=..&elevation=..&distance=..&reso=..`` and the backend
renders JPEGs through the normal ``render_view`` path (jitted per
resolution, cached).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import jax.numpy as jnp
import numpy as np

from ..data.cameras import c2w_from_up_and_look_at
from ..models.scene import RenderConfig, SceneState, render_view
from ..ops.camera import CameraIntrinsics

PAGE = """<!DOCTYPE html><html><head><title>gsgen-tpu viewer</title><style>
body{background:#111;color:#eee;font-family:sans-serif;margin:1em}
img{image-rendering:auto;border:1px solid #333}
label{margin-right:1em}</style></head><body>
<h3>gsgen-tpu viewer</h3>
<div><label>azimuth <input id=az type=range min=-180 max=180 value=0></label>
<label>elevation <input id=el type=range min=-89 max=89 value=20></label>
<label>distance <input id=di type=range min=10 max=60 value=25></label>
<label>reso <select id=re><option>128</option><option selected>256</option>
<option>512</option></select></label>
<label><input id=rot type=checkbox checked>auto-rotate</label></div>
<p><img id=v width=512 height=512></p>
<script>
const q=id=>document.getElementById(id);let busy=false;
async function refresh(){if(busy)return;busy=true;
 const u=`/render?azimuth=${q('az').value}&elevation=${q('el').value}`+
  `&distance=${q('di').value/10}&reso=${q('re').value}`;
 const r=await fetch(u);const b=await r.blob();
 q('v').src=URL.createObjectURL(b);busy=false}
setInterval(()=>{if(q('rot').checked){q('az').value=
 (parseFloat(q('az').value)+383)%360-180}refresh()},200);
for(const id of['az','el','di','re'])q(id).oninput=refresh;
refresh();
</script></body></html>"""


class SceneViewer:
    def __init__(self, state: SceneState, rcfg: RenderConfig,
                 port: int = 8090):
        self.state = state
        self.rcfg = rcfg
        self.port = port

    def render(self, azimuth, elevation, distance, reso) -> bytes:
        import math
        from PIL import Image
        ar, er = math.radians(azimuth), math.radians(elevation)
        pos = np.array([distance * math.cos(er) * math.cos(ar),
                        distance * math.cos(er) * math.sin(ar),
                        distance * math.sin(er)])
        c2w = jnp.asarray(c2w_from_up_and_look_at(
            np.array([0.0, 0.0, 1.0]), np.zeros(3), pos))
        intr = CameraIntrinsics.from_reso(int(reso))
        out = render_view(self.state.params, self.state.active, c2w, intr,
                          self.rcfg, jnp.zeros((3,)))
        img = np.clip(np.asarray(out["rgb"]), 0, 1)
        buf = io.BytesIO()
        Image.fromarray((img * 255).astype(np.uint8)).save(buf, "JPEG",
                                                           quality=90)
        return buf.getvalue()

    def serve(self, blocking: bool = True):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    body = PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                elif u.path == "/render":
                    q = {k: v[0] for k, v in parse_qs(u.query).items()}
                    body = viewer.render(
                        float(q.get("azimuth", 0)),
                        float(q.get("elevation", 20)),
                        float(q.get("distance", 2.5)),
                        int(q.get("reso", 256)))
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                else:
                    self.send_response(404)
                    body = b""
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.httpd = ThreadingHTTPServer(("0.0.0.0", self.port), Handler)
        print(f"viewer at http://localhost:{self.port}/")
        if blocking:
            self.httpd.serve_forever()
        else:
            t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
            t.start()
            return t
