#!/bin/sh
# Build the native image pipeline library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC imgproc.cpp -o libhifihr_imgproc.so -ljpeg
echo "built native/libhifihr_imgproc.so"
