"""Interactive web viewer — free-view rendering of a trained map.

The reference ships a GLFW/Dear-ImGui viewer that draws the SLAM map and
free-view gaussian renders via GaussianMapper::renderFromPose (reference:
viewer/imgui_viewer.cpp, src/gaussian_mapper.cpp:2484-2538); it is flagged
"under development" and disabled in the shipped examples. Headless TPU
hosts have no GL stack, so the equivalent here is a self-contained web
viewer: a stdlib HTTP server renders JPEG frames on demand, and the
browser page provides WASD + mouse-drag fly controls.

Two modes:
  * checkpoint mode (this module's CLI): render a saved orbax checkpoint.
  * LIVE mode (`serve_live`, wired via the SLAM apps' --viewer-port flag):
    render from the RUNNING mapper's trainer state between train
    dispatches — the renderFromPose equivalent (the reference renders from
    the live GaussianMapper, src/gaussian_mapper.cpp:2484-2538). Each
    /render request snapshots `trainer.state` (an atomic pytree-reference
    read), so the flight view sharpens as mapping progresses.

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

    anchors_np = np.asarray(ts.anchors.anchor)
    active = np.asarray(ts.anchors.active)
    center = anchors_np[active].mean(axis=0)

    from segs_slam_tpu.models.renderer import calibrate_eval_config

    _kf0 = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0],
                    trans=(-center).tolist())
    _cal = {k: jnp.asarray(v) for k, v in _kf0.render_inputs().items()}
    rc = calibrate_eval_config(rc, mc, ts.anchors, ts.decoders, [_cal], w, h)
    chain = EvalRenderer(mc, rc, w, h, jnp.zeros(3))

    def _render(cam_in):
        return chain(ts.anchors, ts.decoders, cam_in)

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


def make_server(render_pose, start_pos_fn, w, h, port):
    """HTTP server over a render_pose(pos, yaw, pitch) -> HxWx3 u8 callable.
    start_pos_fn is called per /state request (the live map's centroid
    moves as mapping grows)."""
    from PIL import Image

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
                    {"pos": start_pos_fn(), "yaw": 0.0}
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

    return ThreadingHTTPServer(("0.0.0.0", port), Handler)


def _pose_to_cam_inputs(pos, yaw, pitch, cam):
    """Fly-control pose -> Keyframe render inputs."""
    import jax.numpy as jnp

    from segs_slam_tpu.core import se3
    from segs_slam_tpu.core.keyframe import Keyframe

    fw = np.array([
        np.sin(yaw) * np.cos(pitch), np.sin(pitch),
        np.cos(yaw) * np.cos(pitch),
    ])
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fw)
    right /= np.linalg.norm(right)
    up2 = np.cross(fw, right)
    R = np.stack([right, up2, fw], axis=0)  # world-to-camera
    q = np.asarray(se3.rotmat_to_quat(jnp.asarray(R, jnp.float32)))
    t = -R @ np.asarray(pos)
    kf = Keyframe(kf_id=0, camera=cam, quat=q, trans=t)
    return {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}


def serve_live(trainer, port=8600, size=480):
    """LIVE viewer: fly around the map WHILE the mapper builds it — the
    renderFromPose equivalent (reference: src/gaussian_mapper.cpp:2484-2538
    renders from the running mapper under its render mutex; here each
    request snapshots trainer.state and the JAX runtime interleaves the
    render dispatch between train steps).

    Returns the server thread (daemon). Renders mid-gray until the trainer
    has initialized. Uses the trainer's own model/raster config so the
    render matches what the mapper optimizes.
    """
    import jax.numpy as jnp

    from segs_slam_tpu.core.camera import Camera
    from segs_slam_tpu.models.renderer import EvalRenderer

    w = h = size
    cam = Camera(camera_id=0, width=w, height=h, fx=0.9 * w, fy=0.9 * w,
                 cx=w / 2, cy=h / 2)
    chain_box = {}
    lock = threading.Lock()

    def render_pose(pos, yaw, pitch):
        st = trainer.state  # atomic snapshot of the live pytree
        if st is None:
            return np.full((h, w, 3), 64, np.uint8)
        cam_in = _pose_to_cam_inputs(pos, yaw, pitch, cam)
        if "chain" not in chain_box:
            # lazy: the first request pays the eval-chain compile (the
            # persistent cache makes reruns instant); tier prefixes are
            # calibrated against the live map at this moment
            from segs_slam_tpu.models.renderer import calibrate_eval_config

            rc = calibrate_eval_config(
                trainer.raster_config, trainer.model_config,
                st.anchors, st.decoders, [cam_in], w, h)
            chain_box["chain"] = EvalRenderer(
                trainer.model_config, rc, w, h, jnp.zeros(3))
        with lock:  # one viewer render in flight at a time
            img = np.asarray(chain_box["chain"](st.anchors, st.decoders,
                                                cam_in))
        return (np.clip(np.transpose(img, (1, 2, 0)), 0, 1) * 255).astype(
            np.uint8)

    def start_pos():
        st = trainer.state
        if st is None:
            return [0.0, 0.0, -2.0]
        active = np.asarray(st.anchors.active)
        if not active.any():
            return [0.0, 0.0, -2.0]
        center = np.asarray(st.anchors.anchor)[active].mean(axis=0)
        return (center + np.array([0.0, 0.0, -1.5])).tolist()

    srv = make_server(render_pose, start_pos, w, h, port)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    print(f"[viewer] LIVE viewer on http://localhost:{port}/ ({w}x{h})",
          flush=True)
    return th


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

    render_pose, start_pos, (w, h) = build_renderer(args)
    srv = make_server(render_pose, lambda: start_pos, w, h, args.port)
    print(f"viewer on http://localhost:{args.port}/ "
          f"({w}x{h}, ckpt {args.ckpt})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
