#!/bin/bash
# Build the reference renderer (csrt) as a CPU binary for the perf
# baseline (VERDICT r3 missing #1).  The host has no tinyexr/assimp/
# pugixml and nothing may be installed, so shims/ supplies minimal
# header-only stand-ins (see each header for scope).  Sources compile
# unchanged from the READ-ONLY /root/reference tree; the binary and
# objects land here.  -O3 -DNDEBUG gives the reference its
# best shot on this host.  (-march=native was tried and SEGFAULTS the
# classroom render — miscompilation at skylake-avx512; generic -O3 works
# and measures within noise on the scenes that ran under both.)
set -e
cd "$(dirname "$0")"
REF=/root/reference
OUT=build
mkdir -p "$OUT"

CXX=${CXX:-g++}
# -include cmath: microfacet.hpp calls ::pow without including <cmath>
# (compiles under nvcc/MSVC); force-include instead of editing the
# read-only reference
FLAGS="-O3 -DNDEBUG -std=c++17 -w -include cmath
  -I$REF/include -Ishims -I$REF/extern/ArHosekSkyModel -I$REF/extern/stb"

SRCS=$(find $REF/src -name '*.cpp'; echo $REF/apps/main.cpp; echo shims/tinyexr_impl.cpp)
CSRCS=$(find $REF/extern/ArHosekSkyModel -name '*.c'; echo /root/repo/mcpt_tpu/native/piz.c)

PIDS=()
OBJS=()
for s in $SRCS; do
  o="$OUT/$(echo "${s#$REF/}" | tr '/' '_').o"
  OBJS+=("$o")
  if [ ! -f "$o" ] || [ "$s" -nt "$o" ]; then
    $CXX $FLAGS -c "$s" -o "$o" &
    PIDS+=($!)
  fi
done
for s in $CSRCS; do
  o="$OUT/$(echo "${s#$REF/}" | tr '/' '_').o"
  OBJS+=("$o")
  if [ ! -f "$o" ] || [ "$s" -nt "$o" ]; then
    gcc -O3 -DNDEBUG -w -c "$s" -o "$o" &
    PIDS+=($!)
  fi
done
for p in "${PIDS[@]}"; do wait "$p"; done

$CXX $FLAGS "${OBJS[@]}" -o "$OUT/csrt" -lz -lpthread
echo "built $OUT/csrt"
