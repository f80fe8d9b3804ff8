"""Packed (eval-only) binning parity: binned_blend_eval must reproduce the
full-f32 binned_blend image up to f16 payload rounding, with the identical
instance set.

The packed path halves the two big sort bandwidths (the dominant eval cost
on real maps — scripts/profile_blend_stages.py); correctness here means
(a) the same gaussians land in the same tiles in the same depth order, and
(b) the f16 feature rounding perturbs the blended image by less than the
documented bound.
"""

import numpy as np
import jax
import jax.numpy as jnp

from segs_slam_tpu.core import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.models.anchors import empty_state, insert_points
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.models.decoders import init_decoders
from segs_slam_tpu.models.renderer import ChainedEvalRenderer
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.ops.rasterizer.binning import (
    DEPTH_KEY_BITS,
    _depth_key,
    _pack2f16,
    _unpack2f16,
)


def _scene(seed=3, n=40):
    mc = ModelConfig(feat_dim=8, n_offsets=4, appearance_dim=0,
                     embedding_dim=4, capacity=64, voxel_size=0.05)
    rng = np.random.default_rng(seed)
    anchors, _ = insert_points(
        empty_state(mc), rng.uniform([-1, -1, 2], [1, 1, 5], (n, 3)), mc
    )
    anchors = anchors._replace(
        scaling=jnp.full_like(anchors.scaling, np.log(0.3)))
    decoders = init_decoders(jax.random.PRNGKey(0), mc)
    w, h = 48, 32
    cam = Camera(camera_id=0, width=w, height=h, fx=40.0, fy=40.0,
                 cx=w / 2, cy=h / 2)
    kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
    cam_in = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
    return mc, anchors, decoders, cam_in, w, h


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-100, 100, 256), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, 256), jnp.float32)
    a2, b2 = _unpack2f16(_pack2f16(a, b))
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b), atol=5e-4)


def test_depth_key_monotonic():
    d = jnp.asarray(np.sort(np.random.default_rng(1).uniform(0.05, 50.0,
                                                             512)),
                    jnp.float32)
    k = np.asarray(_depth_key(d))
    assert (np.diff(k) >= 0).all()
    assert k.max() < (1 << DEPTH_KEY_BITS)


def _image_pair(rc, seed=3):
    mc, anchors, decoders, cam_in, w, h = _scene(seed)
    bg = jnp.zeros(3)
    ref = ChainedEvalRenderer(mc, rc, w, h, bg, interpret=True,
                              packed=False)(anchors, decoders, cam_in)
    packed = ChainedEvalRenderer(mc, rc, w, h, bg, interpret=True,
                                 packed=True)(anchors, decoders, cam_in)
    return np.asarray(ref), np.asarray(packed)


def test_packed_matches_unpacked_flat():
    rc = RasterConfig(tile=16, compact=256, kmax=8, chunk=64)
    ref, packed = _image_pair(rc)
    assert ref.max() > 0.0
    np.testing.assert_allclose(packed, ref, atol=2e-2)
    # tight on average: f16 rounding is sub-1% per contribution
    assert np.abs(packed - ref).mean() < 2e-3


def test_packed_matches_unpacked_dual_rate():
    rc = RasterConfig(tile=16, compact=256, kmax=8, chunk=64,
                      ksmall=2, nlarge=64)
    ref, packed = _image_pair(rc, seed=5)
    assert ref.max() > 0.0
    np.testing.assert_allclose(packed, ref, atol=2e-2)


def test_packed_supertile_matches_unpacked():
    """Width 128 -> tile grid 8x2 -> the supertile (SUP=4) eval kernel path:
    per-pixel [lo, hi) windows must reproduce the single-tile kernel."""
    mc = ModelConfig(feat_dim=8, n_offsets=4, appearance_dim=0,
                     embedding_dim=4, capacity=64, voxel_size=0.05)
    rng = np.random.default_rng(9)
    anchors, _ = insert_points(
        empty_state(mc), rng.uniform([-2, -1, 2], [2, 1, 5], (40, 3)), mc
    )
    anchors = anchors._replace(
        scaling=jnp.full_like(anchors.scaling, np.log(0.3)))
    decoders = init_decoders(jax.random.PRNGKey(0), mc)
    w, h = 128, 32
    cam = Camera(camera_id=0, width=w, height=h, fx=60.0, fy=60.0,
                 cx=w / 2, cy=h / 2)
    kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
    cam_in = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
    bg = jnp.zeros(3)
    rc = RasterConfig(tile=16, compact=256, kmax=8, chunk=64,
                      ksmall=2, nlarge=64)
    assert rc.grid(w, h)[0] % 4 == 0  # exercises SUP=4
    ref = ChainedEvalRenderer(mc, rc, w, h, bg, interpret=True,
                              packed=False)(anchors, decoders, cam_in)
    packed = ChainedEvalRenderer(mc, rc, w, h, bg, interpret=True,
                                 packed=True)(anchors, decoders, cam_in)
    assert float(jnp.max(ref)) > 0.0
    np.testing.assert_allclose(np.asarray(packed), np.asarray(ref),
                               atol=2e-2)
    assert np.abs(np.asarray(packed) - np.asarray(ref)).mean() < 2e-3


def test_fused_eval_renderer_matches_chained():
    """EvalRenderer (one fused jit, packed sorts) must match the chained
    packed renderer exactly — identical ops, different jit partitioning."""
    from segs_slam_tpu.models.renderer import EvalRenderer

    mc, anchors, decoders, cam_in, w, h = _scene(seed=11)
    bg = jnp.zeros(3)
    rc = RasterConfig(tile=16, compact=256, kmax=8, chunk=64,
                      ksmall=2, nlarge=64)
    chained = ChainedEvalRenderer(mc, rc, w, h, bg, interpret=True,
                                  packed=True)(anchors, decoders, cam_in)
    fused = EvalRenderer(mc, rc, w, h, bg,
                         interpret=True)(anchors, decoders, cam_in)
    assert fused.shape == (3, h, w)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(chained),
                               atol=1e-6)
    assert float(jnp.max(fused)) > 0.0


def test_packed_instance_sets_identical():
    """Same instances in the same tiles: compare tile_start/stop and
    num_instances between the packed and reference binning pipelines."""
    import functools

    from segs_slam_tpu.models.neural_gaussians import (
        generate_neural_gaussians,
    )
    from segs_slam_tpu.ops.rasterizer import visible_filter
    from segs_slam_tpu.ops.rasterizer.binning import (
        compact_gaussians,
        compact_gaussians_packed,
        expand_and_sort,
        expand_and_sort_packed,
    )
    from segs_slam_tpu.ops.rasterizer.preprocess import (
        compute_cov3d,
        preprocess_gaussians,
    )

    mc, anchors, decoders, cam_in, w, h = _scene(seed=7)
    rc = RasterConfig(tile=16, compact=256, kmax=8, chunk=64)
    tx, ty = rc.grid(w, h)

    grid_scale3 = jnp.exp(anchors.scaling[:, :3])
    rotation = anchors.rotation / jnp.maximum(
        jnp.linalg.norm(anchors.rotation, axis=-1, keepdims=True), 1e-12)
    visible = visible_filter(
        anchors.anchor, grid_scale3, rotation, cam_in["world_view_transform"],
        cam_in["full_proj_transform"], w, h, cam_in["tan_fovx"],
        cam_in["tan_fovy"], config=rc, valid=anchors.active)
    neural = generate_neural_gaussians(
        anchors, decoders, cam_in["camera_center"], cam_in["pose7"], visible,
        mc)
    cov3d = compute_cov3d(neural.scaling, neural.rotation, 1.0)
    proj = preprocess_gaussians(
        neural.xyz, cov3d, cam_in["world_view_transform"],
        cam_in["full_proj_transform"], w, h, cam_in["tan_fovx"],
        cam_in["tan_fovy"], rc, valid_in=neural.valid)
    opac = neural.opacity.reshape(-1)
    feats = (proj.mean2d[:, 0], proj.mean2d[:, 1], proj.conic[:, 0],
             proj.conic[:, 1], proj.conic[:, 2], opac,
             neural.color[:, 0], neural.color[:, 1], neural.color[:, 2])
    aux = {
        "rect_min_x": proj.rect_min[:, 0],
        "rect_min_y": proj.rect_min[:, 1],
        "rect_w": proj.rect_max[:, 0] - proj.rect_min[:, 0],
        "touched": proj.tiles_touched.astype(jnp.int32),
        "depth": proj.depth,
        "alive": proj.radius > 0,
    }

    cg = compact_gaussians(feats, aux, rc)
    binned = expand_and_sort(cg, tx, ty, rc)
    pc = compact_gaussians_packed(feats, aux, rc)
    _, tile_start, tile_stop, num_instances, num_large = (
        expand_and_sort_packed(pc, tx, ty, rc))

    assert int(num_instances) == int(binned.num_instances)
    assert int(num_large) == int(binned.num_large)
    np.testing.assert_array_equal(np.asarray(tile_start),
                                  np.asarray(binned.tile_start))
    np.testing.assert_array_equal(np.asarray(tile_stop),
                                  np.asarray(binned.tile_stop))
    assert int(pc.num_valid) == int(cg.num_valid)


def _train_pair(rc_kw, seed=3):
    """Training-path render + grads with packed_train on/off."""
    from segs_slam_tpu.models.renderer import render

    mc, anchors, decoders, cam_in, w, h = _scene(seed)
    bg = jnp.zeros(3)
    rng = np.random.default_rng(seed + 1)
    gt = jnp.asarray(rng.uniform(0, 1, (3, h, w)), jnp.float32)

    def run(packed_train):
        rc = RasterConfig(chunk=64, packed_train=packed_train, **rc_kw)

        def loss_fn(aparams, dparams):
            a = anchors.replace_params(aparams)
            out = render(a, dparams, cam_in, w, h, bg, mc, rc,
                         interpret=True)
            return jnp.mean(jnp.abs(out.image - gt)), out.image

        (l, img), grads = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                             has_aux=True)(
            anchors.params(), decoders)
        return np.asarray(img), l, grads

    return run(False), run(True)


def test_packed_train_forward_matches_unpacked():
    (ref_img, _, _), (pk_img, _, _) = _train_pair(
        dict(tile=16, compact=256, kmax=8, ksmall=2, nlarge=64))
    assert ref_img.max() > 0.0
    np.testing.assert_allclose(pk_img, ref_img, atol=2e-2)
    assert np.abs(pk_img - ref_img).mean() < 2e-3


def test_packed_train_grads_match_unpacked():
    """Gradients flow through the same segment-sum/scatter routing; values
    differ only by the f16 forward rounding."""
    (_, _, g_ref), (_, _, g_pk) = _train_pair(
        dict(tile=16, compact=256, kmax=8))
    leaves_ref = jax.tree.leaves(g_ref)
    leaves_pk = jax.tree.leaves(g_pk)
    assert len(leaves_ref) == len(leaves_pk)
    any_nonzero = False
    for a, b in zip(leaves_ref, leaves_pk):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        scale = np.abs(a).max()
        if scale > 0:
            any_nonzero = True
            np.testing.assert_allclose(b, a, atol=0.05 * scale + 1e-6)
            # directions agree
            cos = (a * b).sum() / max(
                np.linalg.norm(a) * np.linalg.norm(b), 1e-12)
            assert cos > 0.99, cos
    assert any_nonzero


def test_batched_eval_renderer_matches_per_frame():
    """EvalRenderer.render_batch (one lax.map dispatch over a camera stack)
    must reproduce the per-frame renders exactly — same body, one jit."""
    from segs_slam_tpu.models.renderer import EvalRenderer

    mc, anchors, decoders, cam_in, w, h = _scene(seed=13)
    bg = jnp.zeros(3)
    rc = RasterConfig(tile=16, compact=256, kmax=8, chunk=64,
                      ksmall=2, nlarge=64)
    er = EvalRenderer(mc, rc, w, h, bg, interpret=True)

    cams = []
    for i in range(3):
        cam = Camera(camera_id=0, width=w, height=h, fx=40.0, fy=40.0,
                     cx=w / 2, cy=h / 2)
        kf = Keyframe(kf_id=i, camera=cam, quat=[1.0, 0.0, 0.0, 0.0],
                      trans=[0.03 * i, -0.02 * i, 0.05 * i])
        cams.append({k: jnp.asarray(np.asarray(v, np.float32))
                     for k, v in kf.render_inputs().items()})

    singles = [np.asarray(er(anchors, decoders, c)) for c in cams]
    stack = {k: jnp.stack([c[k] for c in cams]) for k in cams[0]}
    batch = np.asarray(er.render_batch(anchors, decoders, stack))
    assert batch.shape == (3, 3, h, w)
    for i in range(3):
        np.testing.assert_allclose(batch[i], singles[i], atol=1e-6)
    assert batch.max() > 0.0


def test_packed_three_tier_matches_unpacked():
    """3-tier expansion (ksmall/kmid+nmid/kmax+nlarge) must reproduce the
    full-grid image exactly when the tiers cover every footprint (nmid
    covers all touched > ksmall, nlarge covers all touched > kmid)."""
    rc3 = RasterConfig(tile=16, compact=256, kmax=8, chunk=64,
                       ksmall=1, kmid=4, nmid=256, nlarge=128)
    ref, packed = _image_pair(RasterConfig(tile=16, compact=256, kmax=8,
                                           chunk=64), seed=5)
    mc, anchors, decoders, cam_in, w, h = _scene(seed=5)
    bg = jnp.zeros(3)
    tiered = ChainedEvalRenderer(mc, rc3, w, h, bg, interpret=True,
                                 packed=True)(anchors, decoders, cam_in)
    assert ref.max() > 0.0
    np.testing.assert_allclose(np.asarray(tiered), ref, atol=2e-2)
    assert np.abs(np.asarray(tiered) - ref).mean() < 2e-3


def test_kanchor_precompaction_lossless_when_under_cap():
    """Per-anchor K-axis pre-compaction (RasterConfig.kanchor): when no
    anchor has more than kanchor alive offsets, the surviving compact set is
    identical to the unrestricted path (the K-sort only reorders within an
    anchor and drops dead slots)."""
    from segs_slam_tpu.ops.rasterizer.binning import compact_gaussians_packed

    rng = np.random.default_rng(7)
    n_anchor, kg = 48, 4
    n = n_anchor * kg
    feats = tuple(
        jnp.asarray(rng.uniform(lo, hi, n).astype(np.float32))
        for lo, hi in [(0, 600), (0, 400), (0.01, 1), (-0.5, 0.5),
                       (0.01, 1), (0.05, 1), (0, 1), (0, 1), (0, 1)]
    )
    # at most 2 alive offsets per anchor
    alive = np.zeros((n_anchor, kg), bool)
    for a in range(n_anchor):
        k = rng.integers(0, 3)
        alive[a, rng.choice(kg, k, replace=False)] = True
    aux = {
        "rect_min_x": jnp.asarray(rng.integers(0, 30, n, dtype=np.int32)),
        "rect_min_y": jnp.asarray(rng.integers(0, 20, n, dtype=np.int32)),
        "rect_w": jnp.asarray(rng.integers(1, 5, n, dtype=np.int32)),
        "touched": jnp.asarray(rng.integers(1, 8, n, dtype=np.int32)),
        "depth": jnp.asarray(rng.uniform(0.5, 20, n).astype(np.float32)),
        "alive": jnp.asarray(alive.reshape(-1)),
    }
    rc0 = RasterConfig(tile=16, compact=128, kmax=8, chunk=64)
    rc1 = RasterConfig(tile=16, compact=128, kmax=8, chunk=64,
                       kanchor=2, kgroup=kg)
    pc0 = compact_gaussians_packed(feats, aux, rc0)
    pc1 = compact_gaussians_packed(feats, aux, rc1)
    assert int(pc0.num_valid) == int(pc1.num_valid) == int(alive.sum())

    def rows(pc):
        m = np.asarray(pc.valid)
        cols = [np.asarray(c)[m] for c in
                (pc.p_xy, pc.p_cab, pc.p_cco, pc.p_rg, pc.p_b, pc.dmeta)]
        return set(zip(*[c.tolist() for c in cols]))

    assert rows(pc0) == rows(pc1)


def test_kanchor_render_close_under_overflow():
    """With kanchor below some anchors' alive counts the render must stay a
    close approximation (only the faintest per-anchor offsets drop)."""
    mc, anchors, decoders, cam_in, w, h = _scene(seed=11, n=48)
    bg = jnp.zeros(3)
    rc0 = RasterConfig(tile=16, compact=256, kmax=8, chunk=64)
    rc1 = RasterConfig(tile=16, compact=256, kmax=8, chunk=64,
                       kanchor=3, kgroup=mc.n_offsets)
    ref = ChainedEvalRenderer(mc, rc0, w, h, bg, interpret=True)(
        anchors, decoders, cam_in)
    kan = ChainedEvalRenderer(mc, rc1, w, h, bg, interpret=True)(
        anchors, decoders, cam_in)
    ref, kan = np.asarray(ref), np.asarray(kan)
    assert ref.max() > 0.0
    assert np.abs(kan - ref).mean() < 2e-2


def test_sel_direct_matches_compacted():
    """Direct-selection eval binning (RasterConfig.sel_direct: one
    footprint-priority selection sort over the raw rows, no compaction
    sort) must emit the IDENTICAL instance multiset (same (tile, depth)
    keys, same f16 payloads) as compact+expand when the alive count fits
    the compaction capacity. Images may differ microscopically where two
    instances tie in the 21-bit depth key (the stable instance sort then
    preserves each path's different pre-sort order), so the image check is
    a tight atol rather than bitwise."""
    from segs_slam_tpu.models.renderer import ChainedEvalRenderer, EvalRenderer
    from segs_slam_tpu.ops.rasterizer.binning import (
        bin_eval_direct,
        compact_gaussians_packed,
        expand_and_sort_packed,
    )

    mc, anchors, decoders, cam_in, w, h = _scene(seed=7)
    bg = jnp.zeros(3)
    for tiers in (dict(ksmall=2, nlarge=64),
                  dict(ksmall=2, kmid=4, nmid=128, nlarge=64)):
        rc = RasterConfig(tile=16, compact=256, kmax=8, chunk=64, **tiers)
        rc_d = RasterConfig(tile=16, compact=256, kmax=8, chunk=64,
                            sel_direct=True, **tiers)

        # structural check: identical sorted instance multiset
        chained = ChainedEvalRenderer(mc, rc, w, h, bg, interpret=True,
                                      packed=True)
        neural = chained._decode(anchors, decoders, cam_in)
        feats, aux = chained._project(neural, cam_in)
        tx, ty = rc.grid(w, h)
        pc = compact_gaussians_packed(feats, aux, rc)
        cols_ref, st_ref, sp_ref, ni_ref, _ = expand_and_sort_packed(
            pc, tx, ty, rc, return_packed=True)
        cols_d, st_d, sp_d, ni_d, nv_d = bin_eval_direct(
            feats, aux, tx, ty, rc_d, return_packed=True)
        assert int(ni_d) == int(ni_ref)
        np.testing.assert_array_equal(np.asarray(st_d), np.asarray(st_ref))
        np.testing.assert_array_equal(np.asarray(sp_d), np.asarray(sp_ref))
        # per-tile instance multisets (only the [start, stop) segments the
        # blend consumes — sentinel rows beyond them are never read and
        # legitimately differ)
        rows_ref = np.stack([np.asarray(c) for c in cols_ref], 1)
        rows_d = np.stack([np.asarray(c) for c in cols_d], 1)
        for t in range(len(np.asarray(st_ref))):
            a, b = int(np.asarray(st_ref)[t]), int(np.asarray(sp_ref)[t])
            seg_ref = rows_ref[a:b]
            seg_d = rows_d[a:b]
            np.testing.assert_array_equal(
                seg_d[np.lexsort(seg_d.T[::-1])],
                seg_ref[np.lexsort(seg_ref.T[::-1])], err_msg=f"tile {t}")

        ref = EvalRenderer(mc, rc, w, h, bg, interpret=True)(
            anchors, decoders, cam_in)
        got = EvalRenderer(mc, rc_d, w, h, bg, interpret=True)(
            anchors, decoders, cam_in)
        assert float(jnp.max(ref)) > 0.0
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-3)


def test_sel_direct_overflow_prefers_large_footprints():
    """Under capacity pressure sel_direct keeps the largest-footprint (then
    most opaque) gaussians; the render must stay finite and non-empty."""
    from segs_slam_tpu.models.renderer import EvalRenderer

    mc, anchors, decoders, cam_in, w, h = _scene(seed=11, n=60)
    bg = jnp.zeros(3)
    rc_d = RasterConfig(tile=16, compact=64, kmax=8, chunk=64,
                        ksmall=2, nlarge=32, sel_direct=True)
    img = EvalRenderer(mc, rc_d, w, h, bg, interpret=True)(
        anchors, decoders, cam_in)
    a = np.asarray(img)
    assert np.isfinite(a).all() and a.max() > 0.0


def test_pack8_matches_f16_packed():
    """pack8 (byte color + 11-bit opacity, 4 payload columns) must match
    the f16-pair sel_direct render within its quantization budget: color
    payloads quantize at 1/255 (<= ~2/255 after blending), opacity at
    1/2047; the depth key is untouched so instance ORDER is identical."""
    from segs_slam_tpu.models.renderer import EvalRenderer

    mc, anchors, decoders, cam_in, w, h = _scene(seed=13)
    bg = jnp.zeros(3)
    rc = RasterConfig(tile=16, compact=256, kmax=8, chunk=64,
                      ksmall=2, nlarge=64, sel_direct=True)
    rc8 = RasterConfig(tile=16, compact=256, kmax=8, chunk=64,
                       ksmall=2, nlarge=64, sel_direct=True, pack8=True)
    ref = EvalRenderer(mc, rc, w, h, bg, interpret=True)(
        anchors, decoders, cam_in)
    got = EvalRenderer(mc, rc8, w, h, bg, interpret=True)(
        anchors, decoders, cam_in)
    assert float(jnp.max(ref)) > 0.0
    d = np.abs(np.asarray(got) - np.asarray(ref))
    assert d.max() < 1.5e-2, d.max()
    assert d.mean() < 1.5e-3, d.mean()


def test_eval_variant_parity_and_fallback():
    """RasterConfig.eval_variant (the production eval upgrade: 3-tier +
    sel_direct + pack8) must render within quantization tolerance of the
    base config, and must return the config UNCHANGED when the packed-path
    constraints fail (big grids fall back to the training binning)."""
    from segs_slam_tpu.models.renderer import EvalRenderer

    mc, anchors, decoders, cam_in, w, h = _scene(seed=17)
    bg = jnp.zeros(3)
    rc = RasterConfig(tile=16, compact=256, kmax=8, chunk=64,
                      ksmall=4, nlarge=64)
    ev = rc.eval_variant(w, h)
    assert ev.sel_direct and ev.pack8 and ev.nmid and ev.kmid == 4
    assert ev.nlarge <= ev.nmid
    ref = EvalRenderer(mc, rc, w, h, bg, interpret=True)(
        anchors, decoders, cam_in)
    got = EvalRenderer(mc, ev, w, h, bg, interpret=True)(
        anchors, decoders, cam_in)
    assert float(jnp.max(ref)) > 0.0
    d = np.abs(np.asarray(got) - np.asarray(ref))
    assert d.max() < 1.5e-2, d.max()

    # fallback: a 1200x680 grid (75x43 tiles) exceeds the packed limits
    assert rc.eval_variant(1200, 680) == rc
    # and tiny kmax cannot host the 3-tier split
    rc2 = RasterConfig(tile=16, compact=256, kmax=4, chunk=64)
    assert rc2.eval_variant(w, h) == rc2


def test_calibrated_tiers_on_heavy_footprints():
    """Regression for the round-5 eval dimming bug: eval_variant's static
    compact//8 tier formula silently truncates tile coverage on maps whose
    footprint distribution is heavy (REAL trained maps; measured -12 dB on
    the 8k-iteration ablation map). calibrate_eval_config must size the
    tier prefixes from the map's own touched histogram and restore parity
    with the exact renderer; the formula config on the same scene must show
    the defect this test exists for."""
    from segs_slam_tpu.models.renderer import (
        EvalRenderer,
        calibrate_eval_config,
    )

    mc, anchors, decoders, cam_in, w, h = _scene(seed=23, n=60)
    # heavy footprints: large world-space scales -> most gaussians touch
    # far more than ksmall tiles
    anchors = anchors._replace(
        scaling=jnp.full_like(anchors.scaling, np.log(0.8)))
    bg = jnp.zeros(3)
    rc = RasterConfig(tile=16, compact=256, kmax=8, chunk=64,
                      ksmall=4, nlarge=64)

    exact = EvalRenderer(mc, rc, w, h, bg, interpret=True)(
        anchors, decoders, cam_in)
    assert float(jnp.max(exact)) > 0.0

    cal = calibrate_eval_config(rc, mc, anchors, decoders, [cam_in], w, h)
    assert cal.sel_direct and cal.pack8
    got = EvalRenderer(mc, cal, w, h, bg, interpret=True)(
        anchors, decoders, cam_in)
    d = np.abs(np.asarray(got) - np.asarray(exact))
    assert d.max() < 2e-2, d.max()

    # the formula sizes must be insufficient on this scene — otherwise the
    # scene no longer exercises the regression and needs heavier footprints
    formula = rc.eval_variant(w, h)
    assert cal.nmid > formula.nmid or cal.nlarge > formula.nlarge
