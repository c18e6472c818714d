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
img{image-rendering:auto;border:1px solid #333;cursor:grab;touch-action:none}
label{margin-right:.8em;font-size:13px}#fps{color:#7c7}</style></head><body>
<h3>gsgen-tpu viewer <span id=fps></span></h3>
<div><label>reso <select id=re><option>128</option><option selected>256</option>
<option>512</option></select></label>
<label>fov <input id=fov type=range min=20 max=120 value=53></label>
<label>near <input id=near type=range min=1 max=100 value=1></label>
<label>far <input id=far type=range min=5 max=1000 value=1000></label>
<label><input id=rot type=checkbox checked>auto-rotate</label>
<span style=color:#888>drag: orbit &middot; right-drag / shift-drag: pan
&middot; wheel: zoom</span></div>
<p><img id=v width=512 height=512></p>
<script>
const q=id=>document.getElementById(id);
let az=0,el=20,di=2.5,cx=0,cy=0,cz=0,busy=false,t0=0;
async function refresh(){if(busy)return;busy=true;t0=performance.now();
 const u=`/render?azimuth=${az}&elevation=${el}&distance=${di}`+
  `&reso=${q('re').value}&fov=${q('fov').value}`+
  `&near=${q('near').value/100}&far=${q('far').value}`+
  `&cx=${cx}&cy=${cy}&cz=${cz}`;
 const r=await fetch(u);const b=await r.blob();
 q('v').src=URL.createObjectURL(b);
 q('fps').textContent=(1000/(performance.now()-t0)).toFixed(1)+' fps';
 busy=false}
setInterval(()=>{if(q('rot').checked){az=(az+543)%360-180}refresh()},150);
for(const id of['re','fov','near','far'])q(id).oninput=refresh;
const img=q('v');let drag=null;
img.onpointerdown=e=>{drag=[e.clientX,e.clientY,e.button===2||e.shiftKey];
 img.setPointerCapture(e.pointerId);e.preventDefault()};
img.oncontextmenu=e=>e.preventDefault();
img.onpointermove=e=>{if(!drag)return;
 const dx=e.clientX-drag[0],dy=e.clientY-drag[1];drag[0]=e.clientX;drag[1]=e.clientY;
 if(drag[2]){const a=az*Math.PI/180,s=di*0.002;
  cx+=s*(dx*Math.sin(a));cy+=s*(-dx*Math.cos(a));cz+=s*dy;}
 else{az=((az-dx*0.4+180)%360+360)%360-180;
  el=Math.max(-89,Math.min(89,el+dy*0.4));}
 q('rot').checked=false;refresh()};
img.onpointerup=()=>{drag=null};
img.onwheel=e=>{di=Math.max(0.3,Math.min(12,di*(1+e.deltaY*0.001)));
 e.preventDefault();refresh()};
refresh();
</script></body></html>"""


class SceneViewer:
    """Multi-client by construction: camera state lives in each
    browser's JS (every request carries its full pose), the HTTP layer
    is a ThreadingHTTPServer, and the one shared resource — the device
    — is guarded by ``_render_lock`` so concurrent clients serialize
    cleanly instead of interleaving dispatches (the viser viewer's
    per-client render loop, utils/viewer/viser_viewer.py:132-171,
    serializes on the GPU the same way)."""

    def __init__(self, state: SceneState, rcfg: RenderConfig,
                 port: int = 8090):
        self.state = state
        self.rcfg = rcfg
        self.port = port
        self.step = None
        self._render_lock = threading.Lock()

    def update_state(self, state: SceneState, step=None):
        """Attach live training state (called between trainer steps —
        clients see the scene evolve, the viser pattern)."""
        self.state = state
        if step is not None:
            self.step = int(step)

    def render(self, azimuth, elevation, distance, reso,
               fov=53.13, near=0.01, far=1000.0,
               center=(0.0, 0.0, 0.0)) -> bytes:
        """Free camera: orbit pose around a pannable center with
        client-driven fov/near/far — viser-viewer parity
        (reference utils/viewer/viser_viewer.py:26-188 GUI controls)."""
        import math
        from PIL import Image
        ar, er = math.radians(azimuth), math.radians(elevation)
        center = np.asarray(center, np.float64)
        pos = center + np.array([distance * math.cos(er) * math.cos(ar),
                                 distance * math.cos(er) * math.sin(ar),
                                 distance * math.sin(er)])
        c2w = jnp.asarray(c2w_from_up_and_look_at(
            np.array([0.0, 0.0, 1.0]), center, pos))
        intr = CameraIntrinsics.from_fov(
            math.radians(float(fov)), 1.0, int(reso),
            near=float(near), far=float(far))
        with self._render_lock:
            out = render_view(self.state.params, self.state.active, c2w,
                              intr, self.rcfg, jnp.zeros((3,)))
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
                        int(q.get("reso", 256)),
                        fov=float(q.get("fov", 53.13)),
                        near=float(q.get("near", 0.01)),
                        far=float(q.get("far", 1000.0)),
                        center=(float(q.get("cx", 0)),
                                float(q.get("cy", 0)),
                                float(q.get("cz", 0))))
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                elif u.path == "/stats":
                    import numpy as _np
                    body = json.dumps({
                        "num_gaussians": int(_np.asarray(
                            viewer.state.active).sum()),
                        "step": viewer.step}).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
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
