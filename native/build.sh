#!/bin/sh
# Build the native host-side components of speechain_tpu.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -o libspeechain_native.so \
    flac_decoder.cpp batch_assembler.cpp
echo "built $(pwd)/libspeechain_native.so"
