"""Find the first NaN in the online mapping path (dev tool)."""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from segs_slam_tpu.core.camera import Camera
from segs_slam_tpu.io import datasets
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.slam.mapper import Mapper, MapperConfig
from segs_slam_tpu.slam.protocol import MappingQueue
from segs_slam_tpu.slam import frontends
from segs_slam_tpu.slam.protocol import KeyframeData, MappingOperation, OperationKind
from segs_slam_tpu.train.config import OptimizationConfig
from segs_slam_tpu.train.trainer import Trainer

W = H = 320
cam = Camera(camera_id=0, width=W, height=H, fx=288.0, fy=288.0, cx=160, cy=160)
frames = datasets.load_replica("/root/data/synth_room")

mc = ModelConfig(capacity=16384)
oc = OptimizationConfig(iterations=3000)
rc = RasterConfig(tile=16, compact=16384, kmax=32, chunk=256)
trainer = Trainer(mc, oc, rc, width=W, height=H)
trainer.scene.add_camera(cam)
queue = MappingQueue()
mapper = Mapper(queue, trainer, cam, MapperConfig(min_num_initial_map_kfs=5))

rng = np.random.default_rng(0)
next_pid = 0
for i in range(0, 150, 8):
    fr = frames[i]
    rgb = fr.load_rgb()
    depth = fr.load_depth(6553.5)
    kfd = KeyframeData(kf_id=i, camera_id=0, quat=np.asarray(fr.quat),
                       trans=np.asarray(fr.trans), image=rgb, depth=depth,
                       timestamp=fr.timestamp)
    op = MappingOperation(kind=OperationKind.LOCAL_MAPPING_BA, keyframes=[kfd])
    pts = frontends.backproject_depth(depth, cam, fr.quat, fr.trans, 0.05,
                                      20.0, stride=8)
    sel = rng.choice(len(pts), 300, replace=False)
    op.points_xyz = pts[sel]
    op.point_ids = np.arange(next_pid, next_pid + 300)
    next_pid += 300
    queue.push(op)
mapper.producer_done = True


def check(tag):
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(trainer.state)[0]:
        a = np.asarray(leaf)
        if a.dtype.kind == "f" and not np.isfinite(a).all():
            bad.append(jax.tree_util.keystr(path))
    if bad:
        print(f"[{tag}] NaN in: {bad[:8]}", flush=True)
        return True
    return False


it = 0
while it < 3000:
    op = queue.pop(timeout=0.01)
    if op is not None:
        if not mapper.initialized:
            mapper._try_initialize(op)
            continue
        import os
        if os.environ.get("NO_INSERT"):
            op.points_xyz = None
        mapper._apply_operation(op)
        if check(f"after op @ iter {it}"):
            break
    if not mapper.initialized:
        continue
    m = trainer.train_iteration()
    it = trainer.iteration
    loss = float(m["loss"])
    if it % 25 == 0 or not np.isfinite(loss):
        print(f"iter {it}: loss={loss:.4f} psnr={float(m['psnr']):.2f} "
              f"active={int(m['n_active'])} ninst={int(m['num_instances'])}",
              flush=True)
    if not np.isfinite(loss):
        check(f"loss NaN @ iter {it}")
        break
print("done", flush=True)
