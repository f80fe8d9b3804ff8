#!/bin/bash
# Round-5 measurement campaign (VERDICT r4 tasks 2-5,7). Serial — one TPU.
# Usage: bash scripts/r5_campaign.sh [b|c|d|e]  (default: all)
set -e
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=/root/results
mkdir -p $R
SR="--dataset replica --path /root/data/synth_room --fx 576 --fy 576 --cx 320 --cy 240 --width 640 --height 480"
AB="--iters-budget 8000 --capacity 16384 --compact 32768 --kmax 16 --keyframe-every 8 --opt-set lambda_depth=0.1"

stage=${1:-all}

# --- B: mapping gap (native vs oracle, +/- shutdown pose refinement) ---
if [ "$stage" = b ] || [ "$stage" = all ]; then
  python -m segs_slam_tpu.apps.slam_rgbd $SR $AB --tracker oracle \
    --out $R/b_oracle 2>&1 | tail -3
  python -m segs_slam_tpu.apps.slam_rgbd $SR $AB --tracker native \
    --out $R/b_native 2>&1 | tail -3
  python -m segs_slam_tpu.apps.slam_rgbd $SR $AB --tracker native \
    --shutdown-pose-refine 3 --out $R/b_native_spr3 2>&1 | tail -3
fi

# --- C: SEGS novelty ablation on the photometric-variation dataset ---
# (per-frame exposure/white-balance; pose oracle isolates the mapping Q)
CP="--dataset replica --path /root/data/synth_room_photo --fx 576 --fy 576 --cx 320 --cy 240 --width 640 --height 480"
CB="--iters-budget 8000 --capacity 16384 --compact 32768 --kmax 16 --keyframe-every 8 --tracker oracle"
if [ "$stage" = c ] || [ "$stage" = all ]; then
  python -m segs_slam_tpu.apps.slam_rgbd $CP $CB \
    --out $R/c_app32_freq1 2>&1 | tail -2
  python -m segs_slam_tpu.apps.slam_rgbd $CP $CB \
    --model-set appearance_dim=0 --out $R/c_app0_freq1 2>&1 | tail -2
  python -m segs_slam_tpu.apps.slam_rgbd $CP $CB \
    --opt-set use_frequency_regularization=False \
    --out $R/c_app32_freq0 2>&1 | tail -2
  python -m segs_slam_tpu.apps.slam_rgbd $CP $CB \
    --model-set appearance_dim=0 \
    --opt-set use_frequency_regularization=False \
    --out $R/c_app0_freq0 2>&1 | tail -2
fi

# --- D: native stereo end-to-end ---
if [ "$stage" = d ] || [ "$stage" = all ]; then
  python scripts/eval_tracker.py --path /root/data/synth_euroc --stereo \
    2>&1 | tail -12
  python -m segs_slam_tpu.apps.slam_stereo --path /root/data/synth_euroc \
    --out $R/d_stereo_native --tracker native --iters-budget 4000 \
    --capacity 16384 --compact 32768 2>&1 | tail -3
fi

# --- E: mono + mono-inertial (tracker-only, fast; then full runs) ---
if [ "$stage" = e ] || [ "$stage" = all ]; then
  echo "== mono pure-vision tracker =="
  python scripts/eval_tracker.py --path /root/data/synth_room --mono \
    --no-imu 2>&1 | tail -10
  echo "== mono-inertial tracker =="
  SG_TRACKER_DEBUG=1 python scripts/eval_tracker.py \
    --path /root/data/synth_room --mono 2>&1 | grep -v "mono-boot" | tail -14
  echo "== slam_mono (mono-inertial) =="
  python -m segs_slam_tpu.apps.slam_mono $SR --iters-budget 6000 \
    --capacity 16384 --compact 32768 --out $R/e_mono_imu 2>&1 | tail -4
  echo "== slam_mono (pure mono) =="
  python -m segs_slam_tpu.apps.slam_mono $SR --iters-budget 6000 \
    --capacity 16384 --compact 32768 --no-imu --out $R/e_mono 2>&1 | tail -4
fi
