#!/bin/sh
# Build the end-to-end parity harness: the reference's vendored VLFeat
# hog.c AND its cereal serialization stack are compiled DIRECTLY FROM
# /root/reference (read-only; never vendored into this repo).
# hog.c shim: see build_reference_baseline.sh for why.
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/reference_parity}
HERE=$(dirname "$0")
WORK=$(mktemp -d)

sed -e '/^extern "C" {/,$d' -e 's/^#define VL_EXPORT inline/#define VL_EXPORT/' \
    "$REF/include/rcr/hog.h" > "$WORK/hog_decls.h"
echo '#endif' >> "$WORK/hog_decls.h"   # re-close the include guard
printf '#include "hog_decls.h"\n#include "hog.c"\n' > "$WORK/hog_shim.c"

gcc -O2 -std=c11 -c -o "$WORK/hog.o" "$WORK/hog_shim.c" \
    -I "$WORK" -I "$REF/include/rcr"
g++ -O2 -std=c++14 -o "$OUT" "$HERE/reference_parity.cc" "$WORK/hog.o" \
    -I "$REF/3rdparty/cereal-1.1.1/include" -I "$REF/include" \
    $(pkg-config --cflags --libs opencv4) -lm
rm -rf "$WORK"
echo "built $OUT"
