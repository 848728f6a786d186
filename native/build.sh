#!/bin/sh
# Build the native host-runtime library for superviseddescent_tpu.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC -o libsdtpu_host.so sdtpu_host.cpp
echo "built native/libsdtpu_host.so"
