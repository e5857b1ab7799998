#!/bin/sh
# Build the native I/O runtime shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -o libpanoio.so panoio.cpp -lpng -lz -ltiff
echo "built $(pwd)/libpanoio.so"
