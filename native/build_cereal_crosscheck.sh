#!/bin/sh
# Build the cereal cross-check against the reference's vendored cereal and
# cv::Mat adapter (compiled from /root/reference, never vendored here).
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/cereal_crosscheck}
HERE=$(dirname "$0")
g++ -O1 -std=c++14 -o "$OUT" "$HERE/cereal_crosscheck.cc" \
    -I "$REF/3rdparty/cereal-1.1.1/include" -I "$REF/include" \
    $(pkg-config --cflags --libs opencv4)
echo "built $OUT"
