#!/bin/sh
# Build the native host-side builder library.
set -e
cd "$(dirname "$0")"
CXX=${CXX:-c++}
$CXX -O3 -shared -fPIC -o libedcore.so edcore.cpp
echo "built $(pwd)/libedcore.so"
