#!/bin/bash
# Build the reference (/root/reference, read-only) CPU binaries for
# head-to-head baseline measurement.  Nothing is copied into this repo:
# sources compile in place with -I shims for gflags/glog (not installed
# here) and legacy OpenCV constant names.  Outputs land in
# .cache/refbuild (gitignored).
set -euo pipefail
cd "$(dirname "$0")/../.."
OUT=${1:-.cache/refbuild}
mkdir -p "$OUT"
COMPAT=tools/reference_baseline/compat
# c++14: the sources do `using namespace std` and define util::clamp,
# which is ambiguous against C++17's std::clamp
FLAGS="-O3 -march=native -std=c++14 -w -I $COMPAT \
  -include $COMPAT/cvcompat.h $(pkg-config --cflags opencv4)"
LIBS=$(pkg-config --libs opencv4)

SRC=/root/reference/CPU
g++ $FLAGS -I "$SRC" "$SRC/main.cpp" "$SRC/util.cpp" \
  "$SRC/OpticalFlow.cpp" "$SRC/StitchTool.cpp" -o "$OUT/ref_stitch6" $LIBS
echo "built $OUT/ref_stitch6"

S4=/root/reference/CPU_4Input
g++ $FLAGS -I "$S4" "$S4/main.cpp" "$S4/util.cpp" \
  "$S4/OpticalFlow.cpp" "$S4/StitchTool.cpp" -o "$OUT/ref_stitch4" $LIBS
echo "built $OUT/ref_stitch4"
