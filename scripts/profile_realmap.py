"""Per-stage eval-render profile on a REAL saved map (anchors.ply + mlps/).

The synthetic full-map profile (profile_fullmap_compose.py) showed
2.4 ms/frame at the 2^17/kmax16 point, but the committed run artifacts read
22.4 ms/frame on the trained map — this loads that exact map + its keyframe
cameras and breaks the chained eval render into per-stage timings to find
the real bottleneck.

Usage: python scripts/profile_realmap.py /root/results/room_oracle_8k_full \
           [--capacity 65536 --compact 131072 --kmax 16 --ksmall 4 --nlarge 8192]
"""

import argparse
import sys

sys.path.insert(0, ".")
import json
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from segs_slam_tpu.core.camera import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.core import se3
from segs_slam_tpu.io.ply import load_anchor_ply
from segs_slam_tpu.models.anchors import empty_state
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.models.decoders import init_decoders
from segs_slam_tpu.models.renderer import ChainedEvalRenderer


def load_map(run_dir: Path, mc: ModelConfig):
    d = load_anchor_ply(run_dir / "anchors.ply")
    n = d["anchor"].shape[0]
    st = empty_state(mc)
    assert n <= mc.capacity, (n, mc.capacity)

    def pad(cap_arr, vals):
        a = np.zeros(cap_arr.shape, np.float32)
        a[:n] = vals
        return jnp.asarray(a)

    st = st._replace(
        anchor=pad(st.anchor, d["anchor"]),
        offset=pad(st.offset, d["offset"]),
        feat=pad(st.feat, d["feat"]),
        scaling=pad(st.scaling, d["scaling"]),
        rotation=pad(st.rotation, d["rotation"]),
        opacity=pad(st.opacity, d["opacity"]),
        active=jnp.asarray(np.arange(mc.capacity) < n),
    )

    decoders = init_decoders(jax.random.PRNGKey(0), mc)
    mlps = run_dir / "mlps"

    def loadtxt(name):
        return np.loadtxt(mlps / f"{name}.txt", dtype=np.float32)

    def set_mlp2(params, name):
        for l in ("l1", "l2"):
            w = loadtxt(f"mlp_{name}_{l}_weight").T
            b = loadtxt(f"mlp_{name}_{l}_bias").reshape(-1)
            assert w.shape == params[name][l]["w"].shape
            params[name][l] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}

    set_mlp2(decoders, "opacity")
    set_mlp2(decoders, "cov")
    set_mlp2(decoders, "color")
    if "appearance" in decoders:
        w = loadtxt("mlp_appearance_weight").T
        b = loadtxt("mlp_appearance_bias").reshape(-1)
        decoders["appearance"] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    return st, decoders, n


def np_rotmat_to_quat(R):
    """Pure-numpy rotmat->quat: the jnp version triggers a device->host
    transfer, which PERMANENTLY degrades axon dispatch throughput ~15-50x
    for the rest of the process (see profile_recover findings) — host math
    must stay on the host."""
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    if tr > 0:
        s = np.sqrt(max(tr + 1.0, 0.0)) * 2.0
        q = [0.25 * s, (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
             (R[1, 0] - R[0, 1]) / s]
    elif R[0, 0] >= R[1, 1] and R[0, 0] >= R[2, 2]:
        s = np.sqrt(max(1.0 + R[0, 0] - R[1, 1] - R[2, 2], 0.0)) * 2.0
        q = [(R[2, 1] - R[1, 2]) / s, 0.25 * s, (R[0, 1] + R[1, 0]) / s,
             (R[0, 2] + R[2, 0]) / s]
    elif R[1, 1] >= R[2, 2]:
        s = np.sqrt(max(1.0 + R[1, 1] - R[0, 0] - R[2, 2], 0.0)) * 2.0
        q = [(R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s, 0.25 * s,
             (R[1, 2] + R[2, 1]) / s]
    else:
        s = np.sqrt(max(1.0 + R[2, 2] - R[0, 0] - R[1, 1], 0.0)) * 2.0
        q = [(R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s,
             (R[1, 2] + R[2, 1]) / s, 0.25 * s]
    q = np.asarray(q)
    return q if q[0] >= 0 else -q


def load_cams(run_dir: Path):
    entries = json.load(open(run_dir / "cameras.json"))
    cams = []
    for e in entries:
        C2W_R = np.asarray(e["rotation"])
        center = np.asarray(e["position"])
        R = C2W_R.T
        t = -R @ center
        q = np_rotmat_to_quat(R)
        cam = Camera(camera_id=0, width=e["width"], height=e["height"],
                     fx=e["fx"], fy=e["fy"], cx=e["width"] / 2,
                     cy=e["height"] / 2)
        kf = Keyframe(kf_id=e["id"], camera=cam, quat=q, trans=t)
        cams.append({k: jnp.asarray(np.asarray(v, np.float32))
                     for k, v in kf.render_inputs().items()})
    return cams, entries[0]["width"], entries[0]["height"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--capacity", type=int, default=65536)
    p.add_argument("--compact", type=int, default=131072)
    p.add_argument("--kmax", type=int, default=16)
    p.add_argument("--ksmall", type=int, default=4)
    p.add_argument("--nlarge", type=int, default=8192)
    p.add_argument("--kmid", type=int, default=0)
    p.add_argument("--nmid", type=int, default=0)
    p.add_argument("--kanchor", type=int, default=0)
    args = p.parse_args()

    from segs_slam_tpu.ops.rasterizer import RasterConfig

    run_dir = Path(args.run_dir)
    mc = ModelConfig(capacity=args.capacity)
    st, decoders, n = load_map(run_dir, mc)
    cams, width, height = load_cams(run_dir)
    print(f"{n} anchors, {len(cams)} cams, {width}x{height}", flush=True)

    rc = RasterConfig(tile=16, compact=args.compact, kmax=args.kmax,
                      chunk=256, ksmall=args.ksmall,
                      nlarge=args.nlarge if args.ksmall else 0,
                      kmid=args.kmid, nmid=args.nmid,
                      kanchor=args.kanchor,
                      kgroup=mc.n_offsets if args.kanchor else 0)
    chain = ChainedEvalRenderer(mc, rc, width, height, jnp.zeros(3))
    dec, proj, blend = chain.jits()

    # warm
    img = chain(st.anchors if hasattr(st, "anchors") else st, decoders,
                cams[0])
    jax.block_until_ready(img)

    N = min(len(cams), 40)
    use = cams[:N]

    # per-stage, synced
    neurals, projs = [], []
    t0 = time.perf_counter()
    for c in use:
        neurals.append(dec(st, decoders, c))
    jax.block_until_ready(neurals)
    t1 = time.perf_counter()
    for nn, c in zip(neurals, use):
        projs.append(proj(nn, c))
    jax.block_until_ready(projs)
    t2 = time.perf_counter()
    imgs = [blend(f, a) for f, a in projs]
    jax.block_until_ready(imgs)
    t3 = time.perf_counter()
    print(f"decode : {(t1-t0)/N*1000:7.2f} ms/frame", flush=True)
    print(f"project: {(t2-t1)/N*1000:7.2f} ms/frame", flush=True)
    print(f"blend  : {(t3-t2)/N*1000:7.2f} ms/frame", flush=True)

    # pipelined chain (the recorder's timing)
    t0 = time.perf_counter()
    imgs = [chain(st, decoders, c) for c in use]
    jax.block_until_ready(imgs)
    dt = (time.perf_counter() - t0) / N * 1000
    print(f"chained: {dt:7.2f} ms/frame ({1000/dt:6.1f} FPS)", flush=True)

    # fused single-jit eval renderer (the production eval path)
    from segs_slam_tpu.models.renderer import EvalRenderer

    er = EvalRenderer(mc, rc, width, height, jnp.zeros(3))
    jax.block_until_ready(er(st, decoders, cams[0]))
    t0 = time.perf_counter()
    imgs = [er(st, decoders, c) for c in use]
    jax.block_until_ready(imgs)
    dt = (time.perf_counter() - t0) / N * 1000
    print(f"fused  : {dt:7.2f} ms/frame ({1000/dt:6.1f} FPS)", flush=True)

    # batched (one lax.map dispatch per 10 frames) — recorder methodology
    B = 10
    padded = use + use[: (-len(use)) % B]
    stacks = []
    for b0 in range(0, len(padded), B):
        grp = padded[b0:b0 + B]
        stacks.append({k: jnp.stack([c[k] for c in grp]) for k in grp[0]})
    jax.block_until_ready(stacks)
    jax.block_until_ready(er.render_batch(st, decoders, stacks[0]))
    t0 = time.perf_counter()
    outs = [er.render_batch(st, decoders, s) for s in stacks]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(padded) * 1000
    print(f"batched: {dt:7.2f} ms/frame ({1000/dt:6.1f} FPS)  [B={B}]",
          flush=True)

    # footprint histogram: how many tiles does each visible gaussian touch?
    # (drives the ksmall/nlarge dual-rate split)
    from segs_slam_tpu.models.neural_gaussians import (
        generate_neural_gaussians,
    )
    from segs_slam_tpu.ops.rasterizer import visible_filter
    from segs_slam_tpu.ops.rasterizer.preprocess import (
        compute_cov3d,
        preprocess_gaussians,
    )

    @jax.jit
    def _touched(anchors, decoders, cam):
        grid_scale3 = jnp.exp(anchors.scaling[:, :3])
        rotation = anchors.rotation / jnp.maximum(
            jnp.linalg.norm(anchors.rotation, axis=-1, keepdims=True),
            1e-12)
        visible = visible_filter(
            anchors.anchor, grid_scale3, rotation,
            cam["world_view_transform"], cam["full_proj_transform"],
            width, height, cam["tan_fovx"], cam["tan_fovy"],
            config=rc, valid=anchors.active)
        neural = generate_neural_gaussians(
            anchors, decoders, cam["camera_center"], cam["pose7"],
            visible, mc)
        cov3d = compute_cov3d(neural.scaling, neural.rotation, 1.0)
        pr = preprocess_gaussians(
            neural.xyz, cov3d, cam["world_view_transform"],
            cam["full_proj_transform"], width, height,
            cam["tan_fovx"], cam["tan_fovy"], rc, valid_in=neural.valid)
        alive = pr.radius > 0
        tc = jnp.where(alive, pr.tiles_touched.astype(jnp.int32), 0)
        bins = jnp.asarray([1, 2, 4, 8, 16, 32, 10**9])
        cum = jnp.asarray([jnp.sum(alive & (tc <= b)) for b in bins])
        return jnp.sum(alive), cum, jnp.sum(tc)

    nal, cum, tot = _touched(st, decoders, cams[0])
    nal = int(nal)
    print(f"alive {nal}, instances(sum touched) {int(tot)}; "
          "cum touched<=1/2/4/8/16/32/inf: "
          + "/".join(str(int(c)) for c in np.asarray(cum)), flush=True)

    # occupancy diagnostics
    from segs_slam_tpu.models.renderer import render
    out = jax.jit(lambda a, d, c: render(
        a, d, c, width, height, jnp.zeros(3), mc, rc))(st, decoders, cams[0])
    print("num_compact:", int(out.num_compact),
          "num_instances:", int(out.num_instances),
          "visible_anchors:", int(out.visible_anchor_mask.sum()), flush=True)


if __name__ == "__main__":
    main()
