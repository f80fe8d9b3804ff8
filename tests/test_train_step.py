import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segs_slam_tpu.core import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.models.anchors import empty_state, insert_points
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.models.decoders import init_decoders
from segs_slam_tpu.models.renderer import render
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.train.config import OptimizationConfig
from segs_slam_tpu.train.densify import make_adjust_anchor
from segs_slam_tpu.train.step import TrainState, init_train_state, make_train_step

W, H = 32, 32


@pytest.fixture(scope="module")
def setup():
    mc = ModelConfig(feat_dim=8, n_offsets=4, appearance_dim=8,
                     embedding_dim=4, capacity=64, voxel_size=0.05)
    oc = OptimizationConfig(
        start_stat=2, update_from=4, update_interval=5, update_until=100,
        use_frequency_regularization=False,
    )
    rc = RasterConfig(tile=16, compact=512, kmax=32, chunk=64)
    cam = Camera(camera_id=0, width=W, height=H, fx=30.0, fy=30.0, cx=16, cy=16)
    kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])

    rng = np.random.default_rng(0)
    pts = rng.uniform([-0.8, -0.6, 1.5], [0.8, 0.6, 4.0], size=(40, 3))
    anchors, n_ins = insert_points(empty_state(mc), pts, mc)
    assert n_ins > 10
    decoders = init_decoders(jax.random.PRNGKey(0), mc)
    ts = init_train_state(anchors, decoders, mc)

    gt = jnp.asarray(
        np.clip(rng.uniform(0.1, 0.9, size=(3, H, W)), 0, 1), jnp.float32
    )
    cam_in = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
    return mc, oc, rc, ts, gt, cam_in


def test_render_shapes(setup):
    mc, oc, rc, ts, gt, cam_in = setup
    out = render(ts.anchors, ts.decoders, cam_in, W, H, jnp.zeros(3), mc, rc)
    assert out.image.shape == (3, H, W)
    assert bool(jnp.isfinite(out.image).all())
    assert out.neural.xyz.shape == (mc.capacity * mc.n_offsets, 3)


def test_train_step_decreases_loss(setup):
    mc, oc, rc, ts, gt, cam_in = setup
    step = jax.jit(make_train_step(mc, oc, rc, W, H))
    bg = jnp.zeros(3)
    ts2, m0 = step(ts, cam_in, gt, bg)
    losses = [float(m0["loss"])]
    for _ in range(25):
        ts2, m = step(ts2, cam_in, gt, bg)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(ts2.step) == 26


def test_adjust_anchor_invariants(setup):
    mc, oc, rc, ts, gt, cam_in = setup
    step = jax.jit(make_train_step(mc, oc, rc, W, H))
    adjust = jax.jit(make_adjust_anchor(mc, oc))
    bg = jnp.zeros(3)
    ts2 = ts
    key = jax.random.PRNGKey(1)
    for i in range(12):
        ts2, m = step(ts2, cam_in, gt, bg)
        if (i + 1) % oc.update_interval == 0 and i + 1 > oc.update_from:
            key, sub = jax.random.split(key)
            ts2 = adjust(ts2, sub)

    active = np.asarray(ts2.anchors.active)
    n = active.sum()
    # compaction invariant: active slots are contiguous from 0
    assert active[:n].all() and not active[n:].any()
    # params stay finite
    for leaf in jax.tree.leaves(ts2.anchors.params()):
        assert np.isfinite(np.asarray(leaf)).all()
    # training still works after adjustment
    ts3, m = step(ts2, cam_in, gt, bg)
    assert np.isfinite(float(m["loss"]))


def test_grown_anchors_land_on_voxel_grid(setup):
    mc, oc, rc, ts, gt, cam_in = setup
    step = jax.jit(make_train_step(mc, oc, rc, W, H))
    adjust = jax.jit(make_adjust_anchor(mc, oc))
    bg = jnp.zeros(3)
    ts2 = ts
    n0 = int(ts.anchors.num_active())
    for i in range(10):
        ts2, _ = step(ts2, cam_in, gt, bg)
    ts3 = adjust(ts2, jax.random.PRNGKey(7))
    n1 = int(ts3.anchors.num_active())
    if n1 > n0:  # growth happened: new anchors sit on some level's grid
        new = np.asarray(ts3.anchors.anchor[n0:n1])
        sizes = [
            mc.voxel_size * int(mc.update_init_factor / mc.update_hierachy_factor**i)
            for i in range(mc.update_depth)
        ]
        ok = np.zeros(len(new), bool)
        for s in sizes:
            ok |= np.all(np.abs(new / s - np.round(new / s)) < 1e-4, axis=1)
        assert ok.all()


def test_depth_supervision_improves_rendered_depth(setup):
    """lambda_depth: the sensor-depth term carries real gradients (through
    the blend VJP's expected-depth cotangent) and pulls the rendered depth
    toward the target."""
    import dataclasses

    mc, oc, rc, ts, gt, cam_in = setup
    ocd = dataclasses.replace(oc, lambda_depth=0.5)
    step = jax.jit(make_train_step(mc, ocd, rc, W, H))
    bg = jnp.zeros(3)
    gt_depth = jnp.full((H, W), 2.5, jnp.float32)

    def depth_err(ts_):
        out = render(ts_.anchors, ts_.decoders, cam_in, W, H, bg, mc, rc)
        opac = 1.0 - out.final_T
        dm = (opac > 0.5).astype(jnp.float32)
        dr = out.depth_map / jnp.maximum(opac, 1e-6)
        return float(jnp.sum(jnp.abs(dr - gt_depth) * dm)
                     / jnp.maximum(jnp.sum(dm), 1.0))

    e0 = depth_err(ts)
    ts2 = ts
    for _ in range(30):
        ts2, m = step(ts2, cam_in, gt, bg, None, gt_depth)
        assert np.isfinite(float(m["loss"]))
    e1 = depth_err(ts2)
    # control without the depth term
    step0 = jax.jit(make_train_step(mc, oc, rc, W, H))
    ts3 = ts
    for _ in range(30):
        ts3, _ = step0(ts3, cam_in, gt, bg)
    e_ctrl = depth_err(ts3)
    assert e1 < 0.7 * e0, (e0, e1)
    assert e1 < e_ctrl, (e1, e_ctrl)
