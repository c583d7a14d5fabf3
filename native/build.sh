#!/bin/sh
# Build the native I/O runtime. Produces native/libfairm_io.so.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared fairm_io.cpp -o libfairm_io.so \
    $(pkg-config --cflags --libs libpng) -ljpeg
echo "built $(pwd)/libfairm_io.so"
