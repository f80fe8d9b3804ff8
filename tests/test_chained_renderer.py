"""ChainedEvalRenderer must produce the fused render()'s exact image.

The chained path exists because the monolithic render jit hits an XLA
scheduling pathology at large operating points (22.6 ms fused vs 2.4 ms
chained at compact=2^17 — scripts/profile_fullmap_compose.py); it computes
the identical ops, so the output must match to float tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp

from segs_slam_tpu.core import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.models.anchors import empty_state, insert_points
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.models.decoders import init_decoders
from segs_slam_tpu.models.renderer import ChainedEvalRenderer, render
from segs_slam_tpu.ops.rasterizer import RasterConfig


def test_chained_matches_fused():
    mc = ModelConfig(feat_dim=8, n_offsets=4, appearance_dim=0,
                     embedding_dim=4, capacity=64, voxel_size=0.05)
    rng = np.random.default_rng(3)
    anchors, _ = insert_points(
        empty_state(mc), rng.uniform([-1, -1, 2], [1, 1, 5], (40, 3)), mc
    )
    anchors = anchors._replace(
        scaling=jnp.full_like(anchors.scaling, np.log(0.3)))
    decoders = init_decoders(jax.random.PRNGKey(0), mc)
    w, h = 48, 32
    cam = Camera(camera_id=0, width=w, height=h, fx=40.0, fy=40.0,
                 cx=w / 2, cy=h / 2)
    kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
    cam_in = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
    bg = jnp.zeros(3)
    rc = RasterConfig(tile=16, compact=256, kmax=8, chunk=64)

    fused = render(anchors, decoders, cam_in, w, h, bg, mc, rc,
                   interpret=True).image
    chain = ChainedEvalRenderer(mc, rc, w, h, bg, interpret=True,
                                packed=False)
    chained = chain(anchors, decoders, cam_in)

    assert chained.shape == fused.shape == (3, h, w)
    np.testing.assert_allclose(np.asarray(chained), np.asarray(fused),
                               atol=1e-5)
    assert float(jnp.max(fused)) > 0.0  # non-trivial scene


def test_chained_dual_rate():
    mc = ModelConfig(feat_dim=8, n_offsets=4, appearance_dim=0,
                     embedding_dim=4, capacity=64, voxel_size=0.05)
    rng = np.random.default_rng(5)
    anchors, _ = insert_points(
        empty_state(mc), rng.uniform([-1, -1, 2], [1, 1, 5], (40, 3)), mc
    )
    anchors = anchors._replace(
        scaling=jnp.full_like(anchors.scaling, np.log(0.3)))
    decoders = init_decoders(jax.random.PRNGKey(0), mc)
    w, h = 48, 32
    cam = Camera(camera_id=0, width=w, height=h, fx=40.0, fy=40.0,
                 cx=w / 2, cy=h / 2)
    kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
    cam_in = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
    bg = jnp.zeros(3)
    rc = RasterConfig(tile=16, compact=256, kmax=8, chunk=64,
                      ksmall=2, nlarge=64)

    fused = render(anchors, decoders, cam_in, w, h, bg, mc, rc,
                   interpret=True).image
    chain = ChainedEvalRenderer(mc, rc, w, h, bg, interpret=True,
                                packed=False)
    np.testing.assert_allclose(
        np.asarray(chain(anchors, decoders, cam_in)), np.asarray(fused),
        atol=1e-5)
