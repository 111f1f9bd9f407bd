"""Live web viewer: the interactive replacement for the reference's
Pangolin thread (Drawer/viewer.cpp:27-91, mapdrawer.cpp).

The reference renders the map in an OpenGL window on the SLAM machine; a
TPU host is headless, so the viewer is a tiny stdlib HTTP server streaming
map snapshots as JSON to a single-file canvas page:

  GET /        -> HTML page (top-down map, trajectory, HUD counters)
  GET /state   -> {"landmarks": [[x,y,z]..], "kfs": [[x,y,z]..],
                   "traj": [[x,y,z]..], "stats": {...}, "seq": N}

Respecting the engine's never-read-in-steady-state rule (docs/PERF.md):
the SLAM loop decides when to publish (`update(...)` copies device arrays
once — e.g. per keyframe insertion), and browsers poll the host-side
snapshot without touching the device.  No third-party dependencies.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>aslam_tpu live map</title><style>
 body{margin:0;background:#111;color:#ddd;font:13px monospace}
 #hud{position:fixed;top:8px;left:8px;white-space:pre;background:#000a;
      padding:8px;border-radius:4px}
 canvas{display:block;width:100vw;height:100vh}
</style></head><body>
<canvas id=c></canvas><div id=hud>connecting...</div>
<script>
const cv=document.getElementById('c'),ctx=cv.getContext('2d');
let seq=-1;
function fit(pts){let xs=pts.map(p=>p[0]),zs=pts.map(p=>p[2]);
 let x0=Math.min(...xs),x1=Math.max(...xs),z0=Math.min(...zs),z1=Math.max(...zs);
 let pad=0.5;x0-=pad;x1+=pad;z0-=pad;z1+=pad;
 let s=Math.min(cv.width/(x1-x0),cv.height/(z1-z0));
 return p=>[(p[0]-x0)*s,cv.height-(p[2]-z0)*s];}
async function tick(){
 try{
  const r=await fetch('/state');const st=await r.json();
  if(st.seq!==seq){seq=st.seq;
   cv.width=innerWidth;cv.height=innerHeight;
   ctx.fillStyle='#111';ctx.fillRect(0,0,cv.width,cv.height);
   const all=st.landmarks.concat(st.traj).concat(st.kfs);
   if(all.length){const m=fit(all);
    ctx.fillStyle='#6cf';
    for(const p of st.landmarks){const q=m(p);ctx.fillRect(q[0],q[1],2,2);}
    ctx.strokeStyle='#fc3';ctx.lineWidth=2;ctx.beginPath();
    st.traj.forEach((p,i)=>{const q=m(p);i?ctx.lineTo(q[0],q[1]):ctx.moveTo(q[0],q[1]);});
    ctx.stroke();
    ctx.fillStyle='#f44';
    for(const p of st.kfs){const q=m(p);ctx.fillRect(q[0]-3,q[1]-3,6,6);}}
   document.getElementById('hud').textContent=
    Object.entries(st.stats).map(([k,v])=>k+': '+v).join('\\n');}
 }catch(e){document.getElementById('hud').textContent='disconnected';}
 setTimeout(tick,500);}
tick();
</script></body></html>"""


class WebViewer:
    """Serve live map state over HTTP.  Thread-safe `update` from the SLAM
    loop; `url` for the page; `stop()` to shut down."""

    def __init__(self, port: int = 0, host: str = "127.0.0.1",
                 max_landmarks: int = 20000):
        self._lock = threading.Lock()
        self._state = {"landmarks": [], "kfs": [], "traj": [],
                       "stats": {}, "seq": 0}
        self._max_landmarks = max_landmarks
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API)
                if self.path == "/state":
                    with viewer._lock:
                        body = json.dumps(viewer._state).encode()
                    ctype = "application/json"
                elif self.path == "/":
                    body = _PAGE.encode()
                    ctype = "text/html"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # silence request logging
                pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)
        self._thread.start()

    @property
    def url(self) -> str:
        h, p = self._server.server_address[:2]
        return f"http://{h}:{p}/"

    def update(self, m=None, traj=None, stats: dict | None = None) -> None:
        """Publish a snapshot.  m: MapState (device arrays are read ONCE
        here — call at keyframe cadence, not per frame, on tunneled TPUs);
        traj: [N,4,4] or [N,3] camera positions; stats: HUD counters."""
        new = {}
        if m is not None:
            lm = np.asarray(m.lm_pos)[np.asarray(m.lm_valid)]
            if len(lm) > self._max_landmarks:
                lm = lm[:: len(lm) // self._max_landmarks + 1]
            kf_T = np.asarray(m.kf_T_cw)[np.asarray(m.kf_valid)]
            # camera center = -R^T t
            kf_pos = -np.einsum("kij,ki->kj", kf_T[:, :3, :3], kf_T[:, :3, 3])
            new["landmarks"] = np.round(lm, 4).tolist()
            new["kfs"] = np.round(kf_pos, 4).tolist()
        if traj is not None:
            traj = np.asarray(traj)
            if traj.ndim == 3:  # [N,4,4] T_cw
                traj = -np.einsum("kij,ki->kj", traj[:, :3, :3], traj[:, :3, 3])
            new["traj"] = np.round(traj, 4).tolist()
        if stats is not None:
            new["stats"] = {k: (round(v, 3) if isinstance(v, float) else v)
                            for k, v in stats.items()}
        with self._lock:
            self._state.update(new)
            self._state["seq"] += 1

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
