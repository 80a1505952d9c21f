#!/bin/sh
# Build the native asset-pipeline library (native/sah_native.cpp -> libsah_native.so).
set -e
cd "$(dirname "$0")/.."
mkdir -p build
# -ffp-contract=off: the SAH axis cost must round identically to numpy's
# f32 expression (no FMA fusion) for bit-identical builder outputs.
g++ -O3 -march=native -ffp-contract=off -shared -fPIC -std=c++17 \
    native/sah_native.cpp -o build/libsah_native.so
echo "built build/libsah_native.so"
