#!/bin/bash
# Build the native host library (BGZF/BAM decoder and friends).
set -e
cd "$(dirname "$0")/.."
SRC=strawberry_tpu/native
OUT=$SRC/libstrawberry_host.so
g++ -std=c++17 -O3 -march=native -fPIC -shared -pthread \
    $SRC/bamdecode.cc $SRC/cluster.cc $SRC/compat.cc $SRC/quantprep.cc $SRC/mcf.cc $SRC/em.cc $SRC/assembleprep.cc \
    -lz -o $OUT
echo "built $OUT"
