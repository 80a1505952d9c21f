#!/bin/sh
# Build the native asset-pipeline library (native/sah_native.cpp -> libsah_native.so).
set -e
cd "$(dirname "$0")/.."
mkdir -p build
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    native/sah_native.cpp -o build/libsah_native.so
echo "built build/libsah_native.so"
