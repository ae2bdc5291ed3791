#!/bin/bash
# Build the upstream reference binary (ruolin/strawberry @ /root/reference) in a
# gitignored scratch dir, ONLY for generating golden outputs that our tests
# compare against. Nothing from this tree is committed or imported.
set -e
REF=/root/reference
BUILD=/root/repo/.refbuild
mkdir -p $BUILD
if [ -x $BUILD/strawberry ]; then echo "already built: $BUILD/strawberry"; exit 0; fi
mkdir -p $BUILD/src
if [ ! -d $BUILD/src/src ]; then
  cp -r $REF/src $REF/include $REF/external $BUILD/src/ 2>/dev/null || true
  chmod -R u+w $BUILD/src
fi
cd $BUILD/src/external/samtools-0.1.19
make CFLAGS="-g -O2 -fcommon -fPIC -Wno-implicit-function-declaration -Wno-implicit-int" libbam.a -j4 >/dev/null 2>$BUILD/samtools.log || { tail -30 $BUILD/samtools.log; exit 1; }
cd $BUILD
SRCS="common.cpp fasta.cpp contig.cpp read.cpp gff.cpp estimate.cpp alignments.cpp assembly.cpp Strawberry.cpp bias.cpp"
CPPS=""
for s in $SRCS; do CPPS="$CPPS $BUILD/src/src/$s"; done
g++ -std=c++14 -O2 -pthread -fcommon -w -D_GNU_SOURCE \
  -include string -include cstring -include sys/types.h -include cstdint -include limits -include cassert \
  -I$BUILD/src/include -I$BUILD/src/external/eigen3 -I$BUILD/src/external/samtools-0.1.19 \
  $CPPS $BUILD/src/external/samtools-0.1.19/libbam.a -lz -lpthread \
  -o $BUILD/strawberry 2> $BUILD/strawberry_build.log || { tail -40 $BUILD/strawberry_build.log; exit 1; }
echo "built $BUILD/strawberry"
