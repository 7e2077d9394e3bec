#!/bin/bash
# Build the reference (Vraier/wembed) C++ library + parity driver offline:
# - Eigen comes from tensorflow's bundled headers
# - the Rust sprk index is stubbed (driver selects IndexSNN)
# - drawLib (SFML) and the CLIs (CLI11/girgs, need network FetchContent) are skipped
set -e
REF=/root/reference
OUT=${1:-/tmp/refbuild}
HERE="$(cd "$(dirname "$0")" && pwd)"
EIGEN=/opt/venv/lib/python3.12/site-packages/tensorflow/include
mkdir -p "$OUT"

# the reference includes <eigen3/Eigen/Dense>; shim that prefix onto
# tensorflow's bundled Eigen
mkdir -p "$OUT/eigenshim/eigen3"
ln -sfn "$EIGEN/Eigen" "$OUT/eigenshim/eigen3/Eigen"
ln -sfn "$EIGEN/unsupported" "$OUT/eigenshim/eigen3/unsupported"
INC="-I$HERE -I$EIGEN -I$OUT/eigenshim -I$REF/include"
for lib in utilLib graphLib embeddingLib evaluationLib; do
  for d in "$REF/src/$lib/include" "$REF/src/$lib/include"/*/; do
    [ -d "$d" ] && INC="$INC -I${d%/}"
  done
done
INC="$INC -I$REF/src/SNN/include"

SRCS=$(find "$REF/src" -name '*.cpp' | grep -v -e drawLib -e test -e cli_)
echo "building $(echo "$SRCS" | wc -l) sources -> $OUT/ref_driver"
g++ -O3 -std=c++20 -fopenmp -Wno-unknown-pragmas $INC \
  $SRCS "$HERE/ref_driver.cpp" -o "$OUT/ref_driver"
echo "building eval_driver (quality metrics over evaluationLib)"
g++ -O3 -std=c++20 -fopenmp -Wno-unknown-pragmas $INC \
  $SRCS "$HERE/eval_driver.cpp" -o "$OUT/eval_driver"
echo "building dump_samples (NodeSampler sample-id dumper)"
g++ -O2 -std=c++20 -Wno-unknown-pragmas $INC \
  "$REF/src/utilLib/src/Rand.cpp" "$HERE/dump_samples.cpp" \
  -o "$OUT/dump_samples"
echo ok
