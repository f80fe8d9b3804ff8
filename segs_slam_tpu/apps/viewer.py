"""Interactive web viewer — free-view rendering of a trained map.

The reference ships a GLFW/Dear-ImGui viewer that draws the SLAM map and
free-view gaussian renders via GaussianMapper::renderFromPose (reference:
viewer/imgui_viewer.cpp, src/gaussian_mapper.cpp:2484-2538); it is flagged
"under development" and disabled in the shipped examples. Headless TPU
hosts have no GL stack, so the equivalent here is a self-contained web
viewer: a stdlib HTTP server renders JPEG frames on demand from a saved
checkpoint, and the browser page provides WASD + mouse-drag fly controls.

Usage:
  python -m segs_slam_tpu.apps.viewer --ckpt <orbax dir> [--port 8600] \
      [--size 480] [--capacity 16384]
then open http://localhost:8600/
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

PAGE = """<!doctype html>
<html><head><title>segs_slam_tpu viewer</title><style>
body { background:#111; color:#ddd; font-family:monospace; margin:0 }
#hud { position:fixed; top:8px; left:8px; background:#000a; padding:6px }
img { display:block; margin:0 auto; image-rendering:pixelated }
</style></head><body>
<div id="hud">WASD move &middot; QE up/down &middot; drag to look &middot;
<span id="st"></span></div>
<img id="v" width="__W__" height="__H__">
<script>
let pos = null, yaw = 0, pitch = 0, busy = false, dirty = true;
const keys = {};
fetch('/state').then(r => r.json()).then(s => { pos = s.pos; yaw = s.yaw; });
window.addEventListener('keydown', e => keys[e.key.toLowerCase()] = true);
window.addEventListener('keyup', e => keys[e.key.toLowerCase()] = false);
let drag = null;
const img = document.getElementById('v');
img.addEventListener('mousedown', e => drag = [e.clientX, e.clientY]);
window.addEventListener('mouseup', () => drag = null);
window.addEventListener('mousemove', e => {
  if (!drag) return;
  yaw += (e.clientX - drag[0]) * 0.005;
  pitch += (e.clientY - drag[1]) * 0.005;
  pitch = Math.max(-1.5, Math.min(1.5, pitch));
  drag = [e.clientX, e.clientY];
  dirty = true;
});
function step() {
  if (pos) {
    const sp = 0.04;
    const fw = [Math.sin(yaw)*Math.cos(pitch), Math.sin(pitch),
                Math.cos(yaw)*Math.cos(pitch)];
    const rt = [Math.cos(yaw), 0, -Math.sin(yaw)];
    let m = false;
    if (keys['w']) { pos = pos.map((p,i) => p + fw[i]*sp); m = true; }
    if (keys['s']) { pos = pos.map((p,i) => p - fw[i]*sp); m = true; }
    if (keys['a']) { pos = pos.map((p,i) => p - rt[i]*sp); m = true; }
    if (keys['d']) { pos = pos.map((p,i) => p + rt[i]*sp); m = true; }
    if (keys['q']) { pos[1] -= sp; m = true; }
    if (keys['e']) { pos[1] += sp; m = true; }
    if (m) dirty = true;
  }
  if (pos && dirty && !busy) {
    busy = true; dirty = false;
    const t0 = performance.now();
    fetch(`/render?x=${pos[0]}&y=${pos[1]}&z=${pos[2]}&yaw=${yaw}&pitch=${pitch}`)
      .then(r => r.blob()).then(b => {
        img.src = URL.createObjectURL(b);
        document.getElementById('st').textContent =
          `${(performance.now()-t0).toFixed(0)} ms`;
        busy = false;
      }).catch(() => busy = false);
  }
  requestAnimationFrame(step);
}
step();
</script></body></html>"""


def build_renderer(args):
    import jax
    import jax.numpy as jnp

    from segs_slam_tpu.core.camera import Camera
    from segs_slam_tpu.core.keyframe import Keyframe
    from segs_slam_tpu.io.checkpoint import load_train_state
    from segs_slam_tpu.models.anchors import empty_state
    from segs_slam_tpu.models.config import ModelConfig
    from segs_slam_tpu.models.decoders import init_decoders
    from segs_slam_tpu.models.renderer import EvalRenderer
    from segs_slam_tpu.ops.rasterizer import RasterConfig
    from segs_slam_tpu.train.step import init_train_state

    mc = ModelConfig(capacity=args.capacity)
    template = init_train_state(
        empty_state(mc), init_decoders(jax.random.PRNGKey(0), mc), mc
    )
    ts = load_train_state(args.ckpt, template)
    w = h = args.size
    cam = Camera(camera_id=0, width=w, height=h, fx=0.9 * w, fy=0.9 * w,
                 cx=w / 2, cy=h / 2)
    rc = RasterConfig(tile=16, compact=args.compact, kmax=args.kmax,
                      chunk=256, ksmall=args.ksmall,
                      nlarge=args.nlarge if args.ksmall else 0)

    chain = EvalRenderer(mc, rc, w, h, jnp.zeros(3))

    def _render(cam_in):
        return chain(ts.anchors, ts.decoders, cam_in)

    anchors_np = np.asarray(ts.anchors.anchor)
    active = np.asarray(ts.anchors.active)
    center = anchors_np[active].mean(axis=0)

    lock = threading.Lock()

    def render_pose(pos, yaw, pitch):
        fw = np.array([
            np.sin(yaw) * np.cos(pitch), np.sin(pitch),
            np.cos(yaw) * np.cos(pitch),
        ])
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fw)
        right /= np.linalg.norm(right)
        up2 = np.cross(fw, right)
        R = np.stack([right, up2, fw], axis=0)  # world-to-camera
        from segs_slam_tpu.core import se3

        q = np.asarray(se3.rotmat_to_quat(jnp.asarray(R, jnp.float32)))
        t = -R @ np.asarray(pos)
        kf = Keyframe(kf_id=0, camera=cam, quat=q, trans=t)
        cam_in = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
        with lock:  # one render at a time on the chip
            img = np.asarray(_render(cam_in))
        return (np.clip(np.transpose(img, (1, 2, 0)), 0, 1) * 255).astype(
            np.uint8
        )

    start_pos = (center + np.array([0.0, 0.0, -1.5])).tolist()
    return render_pose, start_pos, (w, h)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--port", type=int, default=8600)
    p.add_argument("--size", type=int, default=480)
    p.add_argument("--capacity", type=int, default=2**14)
    p.add_argument("--compact", type=int, default=2**15)
    p.add_argument("--kmax", type=int, default=8)
    p.add_argument("--ksmall", type=int, default=4)
    p.add_argument("--nlarge", type=int, default=2**13)
    args = p.parse_args(argv)

    from PIL import Image

    render_pose, start_pos, (w, h) = build_renderer(args)
    page = PAGE.replace("__W__", str(w)).replace("__H__", str(h))

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/":
                self._send(200, page.encode(), "text/html")
            elif u.path == "/state":
                self._send(200, json.dumps(
                    {"pos": start_pos, "yaw": 0.0}
                ).encode(), "application/json")
            elif u.path == "/render":
                q = parse_qs(u.query)

                def f(k, d=0.0):
                    return float(q.get(k, [d])[0])

                rgb = render_pose([f("x"), f("y"), f("z")], f("yaw"),
                                  f("pitch"))
                buf = io.BytesIO()
                Image.fromarray(rgb).save(buf, "JPEG", quality=90)
                self._send(200, buf.getvalue(), "image/jpeg")
            else:
                self._send(404, b"not found", "text/plain")

    srv = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    print(f"viewer on http://localhost:{args.port}/ "
          f"({w}x{h}, ckpt {args.ckpt})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
