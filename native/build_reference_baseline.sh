#!/bin/sh
# Build the reference CPU baseline harness. Compiles the reference's
# vendored VLFeat hog.c DIRECTLY FROM /root/reference (read-only; never
# vendored into this repo) and links OpenCV.
#
# hog.h mixes C++-linkage `inline` declarations with an `extern "C"`
# inclusion of hog.c, which modern g++ rejects; and it cannot be consumed
# from plain C because of that extern "C" tail. So we generate, in /tmp, a
# C prelude = hog.h up to (not including) the `extern "C"` tail, with
# VL_EXPORT defined empty, and compile hog.c as C against it.
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/reference_baseline}
HERE=$(dirname "$0")
WORK=$(mktemp -d)

sed -e '/^extern "C" {/,$d' -e 's/^#define VL_EXPORT inline/#define VL_EXPORT/' \
    "$REF/include/rcr/hog.h" > "$WORK/hog_decls.h"
echo '#endif' >> "$WORK/hog_decls.h"   # re-close the include guard
printf '#include "hog_decls.h"\n#include "hog.c"\n' > "$WORK/hog_shim.c"

gcc -O2 -std=c11 -c -o "$WORK/hog.o" "$WORK/hog_shim.c" \
    -I "$WORK" -I "$REF/include/rcr"
g++ -O2 -std=c++17 -o "$OUT" "$HERE/reference_baseline.cc" "$WORK/hog.o" \
    $(pkg-config --cflags --libs opencv4) -lm
rm -rf "$WORK"
echo "built $OUT"
