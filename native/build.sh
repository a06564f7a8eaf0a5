#!/usr/bin/env bash
# Build libthinkdiff_io.so (ctypes-loaded; no pybind11 in this image).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    thinkdiff_io.cc -o libthinkdiff_io.so -ljpeg -lpthread
echo "built $(pwd)/libthinkdiff_io.so"
