"""Compiled-DP check on REAL TPU (VERDICT r4 missing #5 / next-round #6):
run the dp shard_map train step over a 1-device TPU mesh with the REAL
(non-interpret) Pallas blend kernel inside, multi-step, and verify it
optimizes. The virtual-CPU dryrun (`__graft_entry__.dryrun_multichip`)
keeps interpret mode — that is the CPU mesh's constraint; THIS script is
the evidence that the kernel itself composes with shard_map when compiled.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/dp_compiled_tpu.py
Prints one JSON line {"compiled_dp_ok": true, ...} on success.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from segs_slam_tpu.core import Camera
    from segs_slam_tpu.core.keyframe import Keyframe
    from segs_slam_tpu.models.anchors import empty_state, insert_points
    from segs_slam_tpu.models.config import ModelConfig
    from segs_slam_tpu.models.decoders import init_decoders
    from segs_slam_tpu.ops.rasterizer import RasterConfig
    from segs_slam_tpu.parallel.dp import make_dp_train_step
    from segs_slam_tpu.train.config import OptimizationConfig
    from segs_slam_tpu.train.step import init_train_state

    assert jax.default_backend() == "tpu", jax.default_backend()
    ndev = 1  # the bench environment exposes one real chip
    mesh = Mesh(np.array(jax.devices()[:ndev]), axis_names=("dp",))

    W, H = 128, 128
    mc = ModelConfig(feat_dim=16, n_offsets=4, appearance_dim=16,
                     embedding_dim=8, capacity=1024, voxel_size=0.05)
    oc = OptimizationConfig(start_stat=0, update_from=4, update_interval=5,
                            update_until=1000)
    # chunk % 128 == 0 is the compiled-kernel contract
    rc = RasterConfig(tile=16, compact=4096, kmax=16, chunk=128)
    cam = Camera(camera_id=0, width=W, height=H, fx=120.0, fy=120.0,
                 cx=W / 2, cy=H / 2)
    kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])

    rng = np.random.default_rng(0)
    pts = rng.uniform([-0.8, -0.6, 1.5], [0.8, 0.6, 4.0], size=(300, 3))
    anchors, n_ins = insert_points(empty_state(mc), pts, mc)
    decoders = init_decoders(jax.random.PRNGKey(0), mc)
    ts = init_train_state(anchors, decoders, mc)
    gt = jnp.asarray(np.clip(rng.uniform(0.1, 0.9, (3, H, W)), 0, 1),
                     jnp.float32)
    cam_in = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
    cam_b = {k: jnp.broadcast_to(v, (ndev,) + v.shape)
             for k, v in cam_in.items()}
    gt_b = jnp.broadcast_to(gt, (ndev,) + gt.shape)
    bg = jnp.zeros(3)

    # interpret=False: the REAL Mosaic-compiled Pallas blend inside shard_map
    dp = make_dp_train_step(mesh, mc, oc, rc, W, H, interpret=False)

    t0 = time.time()
    losses = []
    with mesh:
        for i in range(20):
            ts, m = dp(ts, cam_b, gt_b, bg)
            losses.append(float(m["loss"]))
    wall = time.time() - t0
    ok = (np.isfinite(losses).all()
          and np.mean(losses[-5:]) < 0.7 * losses[0]
          and int(ts.step) == 20)
    print(json.dumps({
        "compiled_dp_ok": bool(ok),
        "backend": jax.default_backend(),
        "n_devices": ndev,
        "loss_first": round(losses[0], 5),
        "loss_last5_mean": round(float(np.mean(losses[-5:])), 5),
        "wall_s": round(wall, 1),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
