#!/bin/bash
# Build the native C++ runtime components (wire codec).
set -e
cd "$(dirname "$0")/../ringzk_tpu/runtime"
g++ -O3 -Wall -shared -fPIC -pthread -o libcodec.so codec.cpp
echo "built $(pwd)/libcodec.so"
