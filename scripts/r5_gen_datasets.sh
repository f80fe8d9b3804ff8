#!/bin/bash
# Round-5: regenerate the synthetic datasets (fresh environment each round).
# All generators render through the TPU rasterizer; run serially.
set -e
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

D=/root/data
mkdir -p $D

if [ ! -f $D/synth_room/traj.txt ]; then
  python -m segs_slam_tpu.utils.make_rgbd_dataset --out $D/synth_room \
    --frames 200 --width 640 --height 480 --imu
fi
if [ ! -f $D/synth_room_photo/traj.txt ]; then
  python -m segs_slam_tpu.utils.make_rgbd_dataset --out $D/synth_room_photo \
    --frames 200 --width 640 --height 480 --photometric
fi
if [ ! -f $D/synth_loop_slow/traj.txt ]; then
  python -m segs_slam_tpu.utils.make_rgbd_dataset --out $D/synth_loop_slow \
    --frames 480 --width 640 --height 480 --loop --imu
fi
if [ ! -d $D/synth_euroc/mav0 ]; then
  python -m segs_slam_tpu.utils.make_stereo_dataset --out $D/synth_euroc \
    --frames 120 --width 320 --height 240
fi
echo "datasets ready:"
du -sh $D/*
