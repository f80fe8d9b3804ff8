import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segs_slam_tpu.core import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.ops.rasterizer import RasterConfig, rasterize, visible_filter
from segs_slam_tpu.ops.rasterizer.reference import render_reference


WIDTH, HEIGHT = 48, 32


def _scene(n=60, seed=0):
    rng = np.random.default_rng(seed)
    cam = Camera(
        camera_id=0, width=WIDTH, height=HEIGHT, fx=40.0, fy=40.0,
        cx=WIDTH / 2, cy=HEIGHT / 2,
    )
    kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
    means = rng.uniform([-1.5, -1.0, 2.0], [1.5, 1.0, 6.0], size=(n, 3))
    scales = np.exp(rng.uniform(-3.2, -1.8, size=(n, 3)))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, size=(n,))
    colors = rng.uniform(0.0, 1.0, size=(n, 3))
    bg = np.zeros(3)
    return kf, means, scales, quats, opac, colors, bg


def _run_ours(kf, means, scales, quats, opac, colors, bg, config):
    return rasterize(
        jnp.asarray(means, jnp.float32),
        jnp.asarray(scales, jnp.float32),
        jnp.asarray(quats, jnp.float32),
        jnp.asarray(opac, jnp.float32),
        jnp.asarray(colors, jnp.float32),
        jnp.asarray(kf.world_view_transform),
        jnp.asarray(kf.full_proj_transform),
        WIDTH,
        HEIGHT,
        kf.camera.tan_fovx,
        kf.camera.tan_fovy,
        jnp.asarray(bg, jnp.float32),
        config=config,
    )


@pytest.fixture(scope="module")
def small_config():
    return RasterConfig(tile=16, compact=256, kmax=64, chunk=64)


def test_forward_matches_reference(small_config):
    kf, means, scales, quats, opac, colors, bg = _scene()
    ref = render_reference(
        means, scales, quats, opac, colors,
        kf.world_view_transform, kf.full_proj_transform,
        WIDTH, HEIGHT, kf.camera.tan_fovx, kf.camera.tan_fovy, bg,
        tile=small_config.tile,
    )
    out = _run_ours(kf, means, scales, quats, opac, colors, bg, small_config)
    img = np.asarray(out["image"])
    assert img.shape == (3, HEIGHT, WIDTH)
    np.testing.assert_allclose(img, ref["image"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["final_T"]), ref["final_T"], atol=2e-4)
    np.testing.assert_array_equal(np.asarray(out["radii"]), ref["radii"])
    np.testing.assert_array_equal(np.asarray(out["n_contrib"]), ref["n_contrib"])


def test_forward_nonzero_background(small_config):
    kf, means, scales, quats, opac, colors, _ = _scene(seed=3)
    bg = np.array([1.0, 1.0, 1.0])
    ref = render_reference(
        means, scales, quats, opac, colors,
        kf.world_view_transform, kf.full_proj_transform,
        WIDTH, HEIGHT, kf.camera.tan_fovx, kf.camera.tan_fovy, bg,
        tile=small_config.tile,
    )
    out = _run_ours(kf, means, scales, quats, opac, colors, bg, small_config)
    np.testing.assert_allclose(np.asarray(out["image"]), ref["image"], atol=2e-4)


def test_forward_behind_camera_culled(small_config):
    kf, means, scales, quats, opac, colors, bg = _scene(n=8)
    means[:4, 2] = -3.0  # behind camera
    out = _run_ours(kf, means, scales, quats, opac, colors, bg, small_config)
    radii = np.asarray(out["radii"])
    assert (radii[:4] == 0).all()


def test_gradients_match_dense_autodiff(small_config):
    from segs_slam_tpu.ops.rasterizer.dense import rasterize_dense

    kf, means, scales, quats, opac, colors, bg = _scene(n=24, seed=7)

    target = jnp.asarray(
        np.random.default_rng(0).uniform(size=(3, HEIGHT, WIDTH)), jnp.float32
    )
    common = dict(
        world_view_transform=jnp.asarray(kf.world_view_transform),
        full_proj_transform=jnp.asarray(kf.full_proj_transform),
        width=WIDTH,
        height=HEIGHT,
        tan_fovx=kf.camera.tan_fovx,
        tan_fovy=kf.camera.tan_fovy,
        bg=jnp.asarray(bg, jnp.float32),
        config=small_config,
    )

    def loss_ours(means_, opac_, colors_, scales_, quats_):
        out = rasterize(means_, scales_, quats_, opac_, colors_, **common)
        return jnp.sum((out["image"] - target) ** 2)

    def loss_dense(means_, opac_, colors_, scales_, quats_):
        out = rasterize_dense(means_, scales_, quats_, opac_, colors_, **common)
        return jnp.sum((out["image"] - target) ** 2)

    args = (
        jnp.asarray(means, jnp.float32),
        jnp.asarray(opac, jnp.float32),
        jnp.asarray(colors, jnp.float32),
        jnp.asarray(scales, jnp.float32),
        jnp.asarray(quats, jnp.float32),
    )
    # Same forward values first.
    np.testing.assert_allclose(
        float(loss_ours(*args)), float(loss_dense(*args)), rtol=1e-5
    )
    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2, 3, 4))(*args)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["means", "opac", "colors", "scales", "quats"]
    for go, gd, name in zip(g_ours, g_dense, names):
        go, gd = np.asarray(go), np.asarray(gd)
        assert np.isfinite(go).all(), name
        scale = np.abs(gd).max() + 1e-6
        np.testing.assert_allclose(
            go / scale, gd / scale, atol=2e-4, err_msg=name
        )


def test_visible_filter(small_config):
    kf, means, scales, quats, opac, colors, bg = _scene(n=16)
    means[:3, 2] = -1.0
    vis = visible_filter(
        jnp.asarray(means, jnp.float32),
        jnp.asarray(scales, jnp.float32),
        jnp.asarray(quats, jnp.float32),
        jnp.asarray(kf.world_view_transform),
        jnp.asarray(kf.full_proj_transform),
        WIDTH, HEIGHT, kf.camera.tan_fovx, kf.camera.tan_fovy,
        config=small_config,
    )
    vis = np.asarray(vis)
    assert not vis[:3].any()
    assert vis[3:].any()


def test_instance_overflow_reported():
    config = RasterConfig(tile=16, compact=16, kmax=16, chunk=32)
    kf, means, scales, quats, opac, colors, bg = _scene(n=60)
    out = _run_ours(kf, means, scales, quats, opac, colors, bg, config)
    assert int(out["num_instances"]) > 0


def test_priority_compaction_keeps_brightest():
    """Over capacity, compaction must drop the FAINTEST gaussians, not
    arbitrary ones (graceful overflow; see binning.compact_gaussians)."""
    import jax.numpy as jnp
    from segs_slam_tpu.ops.rasterizer.binning import compact_gaussians
    from segs_slam_tpu.ops.rasterizer import RasterConfig

    n, cap = 64, 16
    rng = np.random.default_rng(0)
    opac = rng.uniform(0.01, 0.2, n).astype(np.float32)
    bright = [5, 40, 63]  # scattered positions incl. the very last slot
    opac[bright] = [0.9, 0.95, 0.99]
    feats = tuple(
        jnp.asarray(rng.uniform(size=n).astype(np.float32)) for _ in range(5)
    ) + (jnp.asarray(opac),) + tuple(
        jnp.asarray(rng.uniform(size=n).astype(np.float32)) for _ in range(3)
    )
    aux = {
        "rect_min_x": jnp.zeros(n, jnp.int32),
        "rect_min_y": jnp.zeros(n, jnp.int32),
        "rect_w": jnp.ones(n, jnp.int32),
        "touched": jnp.ones(n, jnp.int32),
        "depth": jnp.asarray(rng.uniform(1, 5, n).astype(np.float32)),
        "alive": jnp.ones(n, bool),
    }
    cfg = RasterConfig(tile=16, compact=cap, kmax=4, chunk=128)
    cg = compact_gaussians(feats, aux, cfg)
    kept = set(np.asarray(cg.orig_id)[np.asarray(cg.valid)].tolist())
    assert set(bright) <= kept, (bright, kept)
    assert int(cg.num_valid) == n  # true count still reported for overflow
    # kept set is exactly the top-`cap` by opacity
    top = set(np.argsort(-opac)[:cap].tolist())
    assert kept == top


def test_no_acceptance_resurrection_deep_stack():
    """A deep stack crossing the transmittance threshold mid-chunk, followed
    by many near-transparent instances in later chunks: termination must be
    permanent (CUDA forward.cu:425-429 latches `done`), n_contrib must stay
    at the true prefix, and the backward must be finite. Without the latch,
    acceptance resumed in the next chunk and the backward's accepted-set
    suffix product underflowed f32 (t_before = T/sp -> inf)."""
    import jax
    import jax.numpy as jnp
    from segs_slam_tpu.core.camera import Camera
    from segs_slam_tpu.core.keyframe import Keyframe
    from segs_slam_tpu.ops.rasterizer import RasterConfig, rasterize

    n_front, n_back = 40, 400
    n = n_front + n_back
    rng = np.random.default_rng(7)
    # all gaussians cover the same image region; front ones opaque, the long
    # tail nearly transparent (alpha ~ 0.005 keeps test_t hovering at the
    # threshold, which is what resurrected acceptance in the buggy kernel)
    means = np.zeros((n, 3), np.float32)
    means[:, 2] = np.linspace(2.0, 4.0, n)  # depth-ordered front to back
    means[:, :2] = rng.normal(scale=0.01, size=(n, 2))
    scales = np.full((n, 3), 0.3, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opac = np.concatenate([
        np.full(n_front, 0.9, np.float32),
        np.full(n_back, 0.005, np.float32),
    ])
    colors = rng.uniform(0.2, 0.9, (n, 3)).astype(np.float32)

    cam = Camera(camera_id=0, width=32, height=32, fx=30, fy=30, cx=16, cy=16)
    kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
    cfg = RasterConfig(tile=16, compact=512, kmax=4, chunk=128)
    common = dict(
        world_view_transform=jnp.asarray(kf.world_view_transform),
        full_proj_transform=jnp.asarray(kf.full_proj_transform),
        width=32, height=32, tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
        bg=jnp.zeros(3), config=cfg, interpret=True,
    )

    def loss(op):
        out = rasterize(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            op, jnp.asarray(colors), **common,
        )
        return jnp.abs(out["image"]).mean(), out

    (val, out), grads = jax.value_and_grad(loss, has_aux=True)(
        jnp.asarray(opac)
    )
    assert np.isfinite(float(val))
    g = np.asarray(grads)
    assert np.isfinite(g).all(), f"nonfinite dopacity: {(~np.isfinite(g)).sum()}"

    # n_contrib stays at the true accepted prefix: with alpha 0.9 stacked,
    # T crosses 1e-4 after ~ceil(log(1e-4)/log(0.1)) = 4 front instances
    nc = np.asarray(out["n_contrib"]).max()
    assert nc <= n_front, f"n_contrib {nc} spans resurrected instances"

    # parity with the NumPy CUDA-semantics oracle (permanent break)
    ref = render_reference(
        means, scales, quats, opac, colors,
        np.asarray(kf.world_view_transform),
        np.asarray(kf.full_proj_transform), 32, 32,
        cam.tan_fovx, cam.tan_fovy, np.zeros(3), tile=cfg.tile,
    )
    np.testing.assert_allclose(
        np.asarray(out["image"]), ref["image"], atol=2e-4
    )


def test_kmax_truncation_error_bound():
    """Quantify the static-kmax footprint truncation: rendering a scene with
    large gaussians at kmax=4/8/64 vs the untruncated NumPy oracle. Error
    must shrink monotonically with kmax and be negligible once kmax covers
    the largest footprint (preprocess.py clamps rects to kmax tiles)."""
    import jax.numpy as jnp
    from segs_slam_tpu.core.camera import Camera
    from segs_slam_tpu.core.keyframe import Keyframe
    from segs_slam_tpu.ops.rasterizer import RasterConfig, rasterize

    rng = np.random.default_rng(11)
    n = 200
    means = rng.uniform([-1.2, -1.2, 2.0], [1.2, 1.2, 5.0], (n, 3)).astype(
        np.float32)
    # a handful of LARGE gaussians whose rects span many tiles
    scales = np.exp(rng.uniform(-4.0, -3.0, (n, 3))).astype(np.float32)
    scales[:12] = np.exp(rng.uniform(-1.6, -1.2, (12, 3)))
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)

    cam = Camera(camera_id=0, width=96, height=96, fx=90, fy=90, cx=48, cy=48)
    kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
    ref = render_reference(
        means, scales, quats, opac, colors,
        np.asarray(kf.world_view_transform),
        np.asarray(kf.full_proj_transform), 96, 96,
        cam.tan_fovx, cam.tan_fovy, np.zeros(3), tile=16,
    )

    errs = {}
    for kmax in (4, 8, 64):
        cfg = RasterConfig(tile=16, compact=512, kmax=kmax, chunk=128)
        out = rasterize(
            *(jnp.asarray(x) for x in (means, scales, quats, opac, colors)),
            jnp.asarray(kf.world_view_transform),
            jnp.asarray(kf.full_proj_transform), 96, 96,
            cam.tan_fovx, cam.tan_fovy, jnp.zeros(3), config=cfg,
            interpret=True,
        )
        errs[kmax] = float(
            np.abs(np.asarray(out["image"]) - ref["image"]).mean()
        )
        if kmax == 4:
            # truncation is active and VISIBLE in the metrics
            assert int(out["num_kmax_truncated"]) > 0
        if kmax == 64:
            assert int(out["num_kmax_truncated"]) == 0

    assert errs[4] >= errs[8] >= errs[64]
    # 36 tiles (96x96 at tile 16) fully covered at kmax=64 -> oracle parity
    assert errs[64] < 2e-4, errs
    # documented bound: at kmax=8 the residual truncation error on this
    # large-footprint-heavy scene stays under ~2% mean intensity
    assert errs[8] < 0.02, errs


def test_dual_rate_expansion_parity():
    """ksmall/nlarge dual-rate expansion must render EXACTLY like the full
    [compact, kmax] grid when nlarge covers every large-footprint gaussian,
    with matching gradients (binning.expand_and_sort)."""
    import jax
    import jax.numpy as jnp
    from segs_slam_tpu.core.camera import Camera
    from segs_slam_tpu.core.keyframe import Keyframe
    from segs_slam_tpu.ops.rasterizer import RasterConfig, rasterize

    rng = np.random.default_rng(13)
    n = 300
    means = rng.uniform([-1.2, -1.2, 2.0], [1.2, 1.2, 5.0], (n, 3)).astype(
        np.float32)
    scales = np.exp(rng.uniform(-4.0, -3.0, (n, 3))).astype(np.float32)
    scales[:20] = np.exp(rng.uniform(-2.2, -1.6, (20, 3)))  # large footprints
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)

    cam = Camera(camera_id=0, width=96, height=96, fx=90, fy=90, cx=48, cy=48)
    kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
    arrs = tuple(jnp.asarray(x) for x in (means, scales, quats, opac))

    def run(cfg):
        def loss(c):
            out = rasterize(
                *arrs, c, jnp.asarray(kf.world_view_transform),
                jnp.asarray(kf.full_proj_transform), 96, 96,
                cam.tan_fovx, cam.tan_fovy, jnp.zeros(3), config=cfg,
                interpret=True,
            )
            return jnp.abs(out["image"]).mean(), out["image"]

        (v, img), g = jax.value_and_grad(loss, has_aux=True)(
            jnp.asarray(colors)
        )
        return np.asarray(img), np.asarray(g)

    single = RasterConfig(tile=16, compact=512, kmax=16, chunk=128)
    dual = RasterConfig(tile=16, compact=512, kmax=16, chunk=128,
                        ksmall=4, nlarge=64)
    img_s, g_s = run(single)
    img_d, g_d = run(dual)
    np.testing.assert_allclose(img_d, img_s, atol=1e-6)
    np.testing.assert_allclose(g_d, g_s, atol=1e-6)

    # under-provisioned nlarge degrades gracefully (image still finite and
    # close; large gaussians beyond nlarge keep only their first ksmall tiles)
    tiny = RasterConfig(tile=16, compact=512, kmax=16, chunk=128,
                        ksmall=4, nlarge=8)
    img_t, _ = run(tiny)
    assert np.isfinite(img_t).all()


def test_depth_and_final_t_gradients_match_dense_autodiff(small_config):
    """The expected-depth and final-transmittance outputs carry gradients
    (depth cotangent = 4th color channel; final_T cotangent folds into the
    background pull — blend.py _bwd_kernel). Checked against dense autodiff
    with a loss that exercises BOTH new cotangent paths plus color."""
    from segs_slam_tpu.ops.rasterizer.dense import rasterize_dense

    kf, means, scales, quats, opac, colors, bg = _scene(n=24, seed=11)
    rng = np.random.default_rng(1)
    target = jnp.asarray(rng.uniform(size=(3, HEIGHT, WIDTH)), jnp.float32)
    target_d = jnp.asarray(rng.uniform(1.5, 4.0, (HEIGHT, WIDTH)), jnp.float32)
    common = dict(
        world_view_transform=jnp.asarray(kf.world_view_transform),
        full_proj_transform=jnp.asarray(kf.full_proj_transform),
        width=WIDTH,
        height=HEIGHT,
        tan_fovx=kf.camera.tan_fovx,
        tan_fovy=kf.camera.tan_fovy,
        bg=jnp.asarray(bg, jnp.float32),
        config=small_config,
    )

    def combined(out):
        opac_img = 1.0 - out["final_T"]
        dnorm = out["depth_map"] / jnp.maximum(opac_img, 1e-6)
        dm = (opac_img > 0.5).astype(jnp.float32)
        return (jnp.sum((out["image"] - target) ** 2)
                + jnp.sum((dnorm - target_d) ** 2 * dm)
                + jnp.sum(out["final_T"] ** 2))

    def loss_ours(means_, opac_, colors_, scales_, quats_):
        return combined(rasterize(means_, scales_, quats_, opac_, colors_,
                                  **common))

    def loss_dense(means_, opac_, colors_, scales_, quats_):
        return combined(rasterize_dense(means_, scales_, quats_, opac_,
                                        colors_, **common))

    args = (
        jnp.asarray(means, jnp.float32),
        jnp.asarray(opac, jnp.float32),
        jnp.asarray(colors, jnp.float32),
        jnp.asarray(scales, jnp.float32),
        jnp.asarray(quats, jnp.float32),
    )
    np.testing.assert_allclose(
        float(loss_ours(*args)), float(loss_dense(*args)), rtol=1e-5
    )
    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2, 3, 4))(*args)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(*args)
    for go, gd, name in zip(g_ours, g_dense,
                            ["means", "opac", "colors", "scales", "quats"]):
        go, gd = np.asarray(go), np.asarray(gd)
        assert np.isfinite(go).all(), name
        scale = np.abs(gd).max() + 1e-6
        np.testing.assert_allclose(go / scale, gd / scale, atol=2e-4,
                                   err_msg=name)
