#!/bin/bash
# Build the native runtime library against system OpenCV 4.
set -e
cd "$(dirname "$0")"
CXX=${CXX:-g++}
$CXX -O3 -fPIC -shared -std=c++17 \
  -I/usr/include/opencv4 \
  dataloader.cpp tracker.cpp \
  -o libsegs_native.so \
  -lopencv_core -lopencv_imgcodecs -lopencv_imgproc -lopencv_calib3d \
  -lopencv_features2d -lpthread
echo "built $(pwd)/libsegs_native.so"
