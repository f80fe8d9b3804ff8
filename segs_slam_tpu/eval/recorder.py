"""Run-artifact recorder: the reference's result-directory layout.

Produces the exact files the reference's mapper and examples write at
shutdown so the offline harness aggregates both systems identically
(reference: renderAndRecordKeyframe/renderAndRecordAllKeyframes
src/gaussian_mapper.cpp:1769-1981, examples/tum_rgbd.cpp:239-263,677-693):

  <out>/rendered/<kfid>.png     <out>/ground_truth/<kfid>.png
  <out>/render_time.txt  (ms)   <out>/psnr.txt
  <out>/dssim.txt               <out>/psnr_gaussian_splatting.txt
  <out>/RunningTime.txt         <out>/TrackingTime.txt
  <out>/gaussians_num.txt       <out>/keyframe_used_times.txt
  <out>/DevicePeakUsageMB.txt   (GpuPeakUsageMB.txt equivalent)
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np
import jax


def _save_png(path: Path, img_chw: np.ndarray) -> None:
    from PIL import Image

    arr = np.clip(np.asarray(img_chw), 0, 1)
    arr = (np.transpose(arr, (1, 2, 0)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


RENDER_BATCH = 10  # frames per eval-render dispatch (batched lax.map form)


def _timed_render_ms(trainer, chain, cams) -> tuple[float, float]:
    """Per-frame forward-render time over staged device-resident cameras,
    measured BOTH ways; returns (batched_ms, per_dispatch_ms).

    The reference's render_time.txt clocks one synced render per keyframe
    (src/gaussian_mapper.cpp:1782-1808; eval/run.py computes FPS as
    1000/mean). On this TPU the per-dispatch number carries a fixed
    ~1-2.5 ms host->device tunnel round-trip per frame (PERF_NOTES.md) that
    the GPU reference does not pay, so the committed headline batches
    RENDER_BATCH frames per dispatch through EvalRenderer.render_batch
    (amortizing the overhead B-fold) — a methodology CHANGE vs the
    reference (ADVICE r3). Both numbers are written as artifacts:
    render_time.txt (batched, headline) and render_time_per_dispatch.txt
    (one dispatch per frame, one sync over the run — closest TPU analogue
    of the reference's loop)."""
    import jax.numpy as jnp

    anchors, decoders = trainer.state.anchors, trainer.state.decoders

    def _per_dispatch():
        jax.block_until_ready(chain(anchors, decoders, cams[0]))
        t0 = time.perf_counter()
        imgs = [chain(anchors, decoders, c) for c in cams]
        jax.block_until_ready(imgs)
        return (time.perf_counter() - t0) * 1000.0 / len(cams)

    batched = getattr(chain, "render_batch", None)
    if batched is None or len(cams) < 2:
        ms = _per_dispatch()
        return ms, ms

    bsz = min(RENDER_BATCH, len(cams))
    # pad the tail batch by repeating the last camera so every dispatch
    # reuses the one compiled (B,)-shape executable
    n = len(cams)
    padded = cams + [cams[-1]] * ((-n) % bsz)
    stacks = []
    for b0 in range(0, len(padded), bsz):
        group = padded[b0:b0 + bsz]
        stacks.append({k: jnp.stack([c[k] for c in group])
                       for k in group[0]})
    jax.block_until_ready(stacks)
    jax.block_until_ready(batched(anchors, decoders, stacks[0]))  # warm
    t0 = time.perf_counter()
    outs = [batched(anchors, decoders, s) for s in stacks]
    jax.block_until_ready(outs)
    batched_ms = (time.perf_counter() - t0) * 1000.0 / len(padded)
    return batched_ms, _per_dispatch()


def record_all_keyframes(trainer, out_dir: str | Path,
                         record_images: bool = True,
                         tracking_times: list | None = None,
                         total_runtime_s: float | None = None) -> dict:
    """Render every keyframe, write metric + timing artifacts; returns the
    aggregate metrics."""
    out = Path(out_dir)
    (out / "rendered").mkdir(parents=True, exist_ok=True)
    (out / "ground_truth").mkdir(parents=True, exist_ok=True)

    render_ms, psnrs, dssims, psnr_gs = [], [], [], []
    items = sorted(trainer.scene.keyframes.items())

    # RENDER TIMING measures pure rendering, like the reference: the
    # reference's render_time.txt clocks ONLY the forward render around a
    # device sync (src/gaussian_mapper.cpp:1782-1808); PSNR etc. are
    # computed outside the timed region. Camera inputs are staged on device
    # first so host-side prep and gt-image transfers never pollute the
    # number; dispatches are pipelined back-to-back with one sync
    # (throughput timing — the faithful TPU analogue; the per-frame-sync
    # alternative pays the host round-trip per frame and is reported in the
    # docs, not here).
    chain = trainer._eval_render()
    cams = [trainer.refined_cam(kf) for _, kf in items]
    if cams:
        per_frame_ms, per_dispatch_ms = _timed_render_ms(trainer, chain,
                                                         cams)
    else:
        per_frame_ms = per_dispatch_ms = 0.0

    # metrics pass (untimed): fused render+metrics per keyframe
    outputs = [trainer.render_and_measure_keyframe(kf) for _, kf in items]
    jax.block_until_ready(outputs)

    for (kid, kf), (img_m, p, s, pg) in zip(items, outputs):
        render_ms.append(per_frame_ms)
        psnrs.append(float(p))
        dssims.append(1.0 - float(s))
        psnr_gs.append(float(pg))
        if record_images:
            _, gt = trainer._kf_inputs(kf)
            mask = np.any(np.asarray(gt) != 0.0, axis=0, keepdims=True)
            _save_png(out / "rendered" / f"{kid:06d}.png", np.asarray(img_m))
            _save_png(out / "ground_truth" / f"{kid:06d}.png",
                      np.asarray(gt) * mask)

    def dump(name, vals, fmt="{:.6f}"):
        with open(out / name, "w") as f:
            for v in vals:
                f.write(fmt.format(v) + "\n")

    dump("render_time.txt", render_ms)
    # same render, one dispatch per frame (no batch amortization of the
    # ~1-2.5 ms tunnel overhead) — the closest analogue of the reference's
    # per-keyframe loop; see _timed_render_ms for the methodology note
    dump("render_time_per_dispatch.txt", [per_dispatch_ms] * len(items))
    dump("psnr.txt", psnrs)
    dump("dssim.txt", dssims)
    dump("psnr_gaussian_splatting.txt", psnr_gs)
    dump("gaussians_num.txt", [int(trainer.state.anchors.num_active())], "{}")
    with open(out / "keyframe_used_times.txt", "w") as f:
        for kid, n in sorted(trainer.scene.kfs_used_times.items()):
            f.write(f"{kid} {n}\n")
    if tracking_times:
        dump("TrackingTime.txt", tracking_times)
    if total_runtime_s is not None:
        dump("RunningTime.txt", [total_runtime_s])

    # device memory peak (GpuPeakUsageMB.txt equivalent)
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak_mb = stats.get("peak_bytes_in_use", 0) / 1e6
        dump("DevicePeakUsageMB.txt", [peak_mb])
    except Exception:
        pass

    return {
        "psnr": float(np.mean(psnrs)) if psnrs else 0.0,
        "dssim": float(np.mean(dssims)) if dssims else 0.0,
        "psnr_gs": float(np.mean(psnr_gs)) if psnr_gs else 0.0,
        "render_fps": 1000.0 / np.mean(render_ms) if render_ms else 0.0,
    }


def record_all_frames(trainer, out_dir: str | Path, frames, est_poses,
                      camera, record_images: bool = False,
                      image_stride: int = 20,
                      batch: int = 16) -> dict:
    """Novel-view evaluation over EVERY tracked frame, not just keyframes
    (reference: renderAndRecordAllframes, src/gaussian_mapper.cpp:1983-2125,
    driven post-run by examples/tum_rgbd.cpp:272-620). Renders each frame at
    its estimated pose against the dataset ground-truth image and writes the
    reference's `<iteration>_images/` artifact layout:

      <out>/<iter>_images/all_image/  all_image_gt/  (pngs, strided)
      <out>/<iter>_images/dssim.txt  psnr_gaussian_splatting.txt  psnr.txt
      <out>/<iter>_images/render_time.txt  AllCameraTrajectory_TUM.txt

    `frames` are dataset frame records (load_rgb()); `est_poses` is a list of
    (quat, trans) world-to-camera estimates, one per frame (None entries are
    skipped). Frames are processed in pipelined batches of `batch` dispatches
    per device sync to bound host-side image memory.
    """
    import jax.numpy as jnp

    from segs_slam_tpu.core.keyframe import Keyframe

    out = Path(out_dir) / f"{trainer.iteration}_images"
    img_dir = out / "all_image"
    gt_dir = out / "all_image_gt"
    out.mkdir(parents=True, exist_ok=True)
    if record_images:
        img_dir.mkdir(exist_ok=True)
        gt_dir.mkdir(exist_ok=True)

    fn = trainer._eval_render_metrics()
    chain = trainer._eval_render()

    def _cam(pose):
        quat, trans = pose
        kf = Keyframe(kf_id=0, camera=camera, quat=quat, trans=trans)
        return {k: jnp.asarray(np.asarray(v, np.float32))
                for k, v in kf.render_inputs().items()}

    def _inputs(fr, pose):
        cam = _cam(pose)
        img = fr.load_rgb()
        if img.shape[0] != 3:
            img = np.transpose(img, (2, 0, 1))
        return cam, jnp.asarray(img, jnp.float32)

    idxs = [i for i, p in enumerate(est_poses[: len(frames)])
            if p is not None]
    psnrs, dssims, psnr_gs, render_ms, rows = [], [], [], [], []
    # warm BOTH jits outside any timed region (a cold `chain` would fold
    # its compile time into the first timed batch and poison the mean)
    if idxs:
        cam, gt = _inputs(frames[idxs[0]], est_poses[idxs[0]])
        jax.block_until_ready(
            fn(trainer.state.anchors, trainer.state.decoders, cam, gt))
        jax.block_until_ready(
            chain(trainer.state.anchors, trainer.state.decoders, cam))
        batched_warm = getattr(chain, "render_batch", None)
        if batched_warm is not None and len(idxs) >= batch:
            stack = {k: jnp.stack([cam[k]] * batch) for k in cam}
            jax.block_until_ready(
                batched_warm(trainer.state.anchors, trainer.state.decoders,
                             stack))

    for b0 in range(0, len(idxs), batch):
        chunk = idxs[b0 : b0 + batch]
        inputs = [_inputs(frames[i], est_poses[i]) for i in chunk]
        # Drain the async host->device transfers (the gt images are ~4 MB
        # each; over the tunneled runtime they'd otherwise complete INSIDE
        # the timed region and dominate it) — reference render_time
        # semantics time the forward render only, gt transfer + metrics
        # outside the clock.
        jax.block_until_ready(inputs)
        batched = getattr(chain, "render_batch", None)
        if batched is not None and len(inputs) == batch:
            stack = {k: jnp.stack([cam[k] for cam, _ in inputs])
                     for k in inputs[0][0]}
            jax.block_until_ready(stack)
            t0 = time.perf_counter()
            timed = batched(trainer.state.anchors, trainer.state.decoders,
                            stack)
            jax.block_until_ready(timed)
        else:  # tail chunk: per-frame dispatches (no (B,)-shape retrace)
            t0 = time.perf_counter()
            timed = [chain(trainer.state.anchors, trainer.state.decoders,
                           cam) for cam, _ in inputs]
            jax.block_until_ready(timed)
        per_ms = (time.perf_counter() - t0) * 1000.0 / len(chunk)
        outs = [fn(trainer.state.anchors, trainer.state.decoders, cam, gt)
                for cam, gt in inputs]
        jax.block_until_ready(outs)
        for i, (cam, gt), (img_m, p, s, pg) in zip(chunk, inputs, outs):
            psnrs.append(float(p))
            dssims.append(1.0 - float(s))
            psnr_gs.append(float(pg))
            render_ms.append(per_ms)
            rows.append(i)
            if record_images and i % image_stride == 0:
                _save_png(img_dir / f"{i:06d}.png", np.asarray(img_m))
                mask = np.any(np.asarray(gt) != 0.0, axis=0, keepdims=True)
                _save_png(gt_dir / f"{i:06d}.png", np.asarray(gt) * mask)

    def dump(name, vals, fmt="{} {:.10f}"):
        with open(out / name, "w") as f:
            for i, v in zip(rows, vals):
                f.write(fmt.format(i, v) + "\n")

    dump("psnr.txt", psnrs)
    dump("dssim.txt", dssims)
    dump("psnr_gaussian_splatting.txt", psnr_gs)
    dump("render_time.txt", render_ms)
    with open(out / "AllCameraTrajectory_TUM.txt", "w") as f:
        for i in rows:
            quat, trans = est_poses[i]
            w_, x_, y_, z_ = np.asarray(quat, np.float64)
            R = np.array([
                [1 - 2 * (y_ * y_ + z_ * z_), 2 * (x_ * y_ - w_ * z_), 2 * (x_ * z_ + w_ * y_)],
                [2 * (x_ * y_ + w_ * z_), 1 - 2 * (x_ * x_ + z_ * z_), 2 * (y_ * z_ - w_ * x_)],
                [2 * (x_ * z_ - w_ * y_), 2 * (y_ * z_ + w_ * x_), 1 - 2 * (x_ * x_ + y_ * y_)],
            ])
            c = -R.T @ np.asarray(trans, np.float64)
            f.write(f"{frames[i].timestamp:.6f} {c[0]:.9f} {c[1]:.9f} "
                    f"{c[2]:.9f} {x_:.9f} {y_:.9f} {z_:.9f} {w_:.9f}\n")

    return {
        "psnr": float(np.mean(psnrs)) if psnrs else 0.0,
        "dssim": float(np.mean(dssims)) if dssims else 0.0,
        "psnr_gs": float(np.mean(psnr_gs)) if psnr_gs else 0.0,
        "render_fps": 1000.0 / np.mean(render_ms) if render_ms else 0.0,
        "n_frames": len(rows),
    }
