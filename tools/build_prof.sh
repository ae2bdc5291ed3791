#!/bin/bash
# Build the gprof profiling harness for the native hot paths.
set -e
cd "$(dirname "$0")/.."
SRC=strawberry_tpu/native
EXTRA=""
if echo '#include <libdeflate.h>' | g++ -E -x c++ - >/dev/null 2>&1; then
  EXTRA="-ldeflate"
fi
g++ -std=c++17 -O2 -g -pg -march=native -pthread \
    $SRC/profmain.cc \
    $SRC/bamdecode.cc $SRC/cluster.cc $SRC/compat.cc $SRC/quantprep.cc \
    $SRC/mcf.cc $SRC/em.cc $SRC/assembleprep.cc $SRC/lemonns.cc $SRC/gffparse.cc \
    -lz $EXTRA -o /tmp/strawb_prof
echo "built /tmp/strawb_prof"
