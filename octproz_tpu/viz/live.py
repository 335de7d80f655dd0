"""Live HTTP viewer: the headless-TPU replacement for the reference's
on-screen display docks.

The reference renders into OpenGL windows on the acquisition workstation
(GLWindow2D B-scan/en-face, octproz_project/octproz/src/glwindow2d.{h,cpp};
1-D raw/processed line plots, src/plotwindow1d.{h,cpp}; the 5-second
throughput info box, src/processing.cpp:193-207).  A TPU host has no display
and is usually remote, so the TPU-native equivalent is a tiny zero-dependency
HTTP server (stdlib ``http.server``) that any browser on the network can
watch:

  /             one-page viewer (auto-refreshing images + live stats)
  /bscan.png    latest B-scan display frame (averaging/MIP over adjacent
                frames, cuda_code.cu:810-866 semantics) through a color LUT
  /enface.png   latest en-face display frame (cuda_code.cu:868-912)
  /ascan.json   centre A-scan of the latest frame (PlotWindow1D analog)
  /stats.json   throughput metrics window (info-box analog)

Frame updates are throttled like the reference's 80 ms redraw timer
(glwindow3d.cpp:316-323): between ticks, incoming volumes only replace the
pending frame.  All rendering on the serving path is host-side numpy — the
HTTP threads never touch the accelerator.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from .image import apply_lut, builtin_lut, to_uint8

_PAGE = """<!doctype html>
<html><head><title>octproz_tpu live</title><style>
 body{background:#111;color:#ddd;font-family:sans-serif;margin:1em}
 img{image-rendering:pixelated;border:1px solid #333;max-width:46vw}
 #stats{font-family:monospace;white-space:pre}
 canvas{border:1px solid #333;background:#000}
</style></head><body>
<h2>octproz_tpu live view</h2>
<div id="stats">waiting for data...</div>
<div><img id="bscan" alt="B-scan"> <img id="enface" alt="en-face"></div>
<h3>centre A-scan</h3><canvas id="ascan" width="600" height="160"></canvas>
<script>
async function tick(){
  const t = Date.now();
  document.getElementById('bscan').src = '/bscan.png?' + t;
  document.getElementById('enface').src = '/enface.png?' + t;
  try {
    const s = await (await fetch('/stats.json')).json();
    document.getElementById('stats').textContent = s.info || JSON.stringify(s);
    const a = await (await fetch('/ascan.json')).json();
    const c = document.getElementById('ascan'), g = c.getContext('2d');
    g.clearRect(0,0,c.width,c.height); g.strokeStyle='#6cf'; g.beginPath();
    const v = a.values || [];
    for (let i = 0; i < v.length; i++) {
      const x = i / Math.max(1, v.length - 1) * c.width;
      const y = c.height - Math.min(1, Math.max(0, v[i])) * c.height;
      i ? g.lineTo(x, y) : g.moveTo(x, y);
    }
    g.stroke();
  } catch (e) {}
}
setInterval(tick, 250); tick();
</script></body></html>"""


def _encode_png(img_u8: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img_u8).save(buf, format="PNG")
    return buf.getvalue()


def _compose(frames: np.ndarray, mip: bool) -> np.ndarray:
    """Averaging / maximum-intensity composite over adjacent frames
    (DISPLAY_FUNCTION semantics, octalgorithmparameters.h:176-179)."""
    return frames.max(axis=0) if mip else frames.mean(axis=0)


class LiveView:
    """Live state holder + HTTP server.

    Wire it to a :class:`~octproz_tpu.runtime.StreamingEngine` via
    ``engine.on_processed = live.update`` and
    ``engine.on_metrics = live.update_stats`` (or use :meth:`attach`).
    """

    def __init__(self, port: int = 0, host: str = "127.0.0.1",
                 lut: str = "gray", bscan_nr: int = 0, enface_depth: int = 0,
                 display_frames: int = 1, mip: bool = False,
                 throttle_s: float = 0.08):
        self._lock = threading.Lock()
        self._lut = builtin_lut(lut) if lut != "gray" else None
        self.bscan_nr = bscan_nr
        self.enface_depth = enface_depth
        self.display_frames = display_frames
        self.mip = mip
        self.throttle_s = throttle_s
        self._last_render = 0.0
        self._bscan_png: Optional[bytes] = None
        self._enface_png: Optional[bytes] = None
        self._ascan: list = []
        self._stats: dict = {}
        self.frames_rendered = 0

        view = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence request logging
                pass

            def do_GET(self):
                path = self.path.split("?")[0]
                if path == "/":
                    body, ctype = _PAGE.encode(), "text/html"
                elif path == "/bscan.png":
                    body, ctype = view._bscan_png or b"", "image/png"
                elif path == "/enface.png":
                    body, ctype = view._enface_png or b"", "image/png"
                elif path == "/ascan.json":
                    body = json.dumps({"values": view._ascan}).encode()
                    ctype = "application/json"
                elif path == "/stats.json":
                    with view._lock:
                        body = json.dumps(view._stats).encode()
                    ctype = "application/json"
                else:
                    self.send_error(404)
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True, name="octproz-liveview")
        self._thread.start()

    @property
    def url(self) -> str:
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}/"

    # -- engine hooks --------------------------------------------------------
    def attach(self, engine) -> None:
        """Chain onto an engine's callbacks (keeps any existing ones)."""
        prev_p, prev_m = engine.on_processed, engine.on_metrics

        def on_processed(vol, nr):
            if prev_p:
                prev_p(vol, nr)
            self.update(vol, nr)

        def on_metrics(stats):
            if prev_m:
                prev_m(stats)
            self.update_stats(stats)

        engine.on_processed = on_processed
        engine.on_metrics = on_metrics

    def update(self, volume: np.ndarray, buffer_nr: int = 0) -> None:
        """Render the latest processed buffer (throttled).

        volume: float (bscans, ascans, depth) 0..1, or a quantized uint
        buffer (converted).  Called from the engine loop thread.
        """
        now = time.monotonic()
        if now - self._last_render < self.throttle_s:
            return
        self._last_render = now

        vol = np.asarray(volume)
        if np.issubdtype(vol.dtype, np.integer):
            vol = vol.astype(np.float32) / float(np.iinfo(vol.dtype).max)
        n_b = vol.shape[0]
        b0 = min(max(self.bscan_nr, 0), n_b - 1)
        b1 = min(b0 + max(self.display_frames, 1), n_b)
        bscan = _compose(vol[b0:b1], self.mip)               # (ascans, depth)
        d0 = min(max(self.enface_depth, 0), vol.shape[2] - 1)
        d1 = min(d0 + max(self.display_frames, 1), vol.shape[2])
        enface = _compose(np.moveaxis(vol[:, :, d0:d1], 2, 0), self.mip)

        def paint(img, vertical):
            if vertical:  # depth axis vertical, reference B-scan orientation
                img = img.T[::-1]
            img = np.clip(img, 0.0, 1.0)
            if self._lut is not None:
                img = apply_lut(img, self._lut)
            return _encode_png(to_uint8(img))

        bscan_png = paint(bscan, True)
        enface_png = paint(enface, False)
        ascan = [float(x) for x in bscan[bscan.shape[0] // 2]]
        with self._lock:
            self._bscan_png, self._enface_png = bscan_png, enface_png
            self._ascan = ascan
            self.frames_rendered += 1
            self._stats.setdefault("buffers", 0)
            self._stats["buffers"] = self._stats.get("buffers", 0) + 1

    def update_stats(self, stats) -> None:
        with self._lock:
            self._stats = {
                "info": stats.info_line(),
                "ascans_per_s": stats.ascans_per_s,
                "bscans_per_s": stats.bscans_per_s,
                "buffers_per_s": stats.buffers_per_s,
                "volumes_per_s": stats.volumes_per_s,
                "mb_per_s": stats.mb_per_s,
                "buffers_processed": stats.buffers_processed,
            }

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()
