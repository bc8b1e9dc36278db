#!/usr/bin/env bash
# Build the reference ngsLD binary (from /root/reference, read-only) as a test
# oracle, using the local header-only GSL shim (gsl_rng taus + correlation).
# The binary is built out-of-tree into tests/.build/ and is NOT committed.
set -euo pipefail

REF=${NGSLD_REFERENCE_DIR:-/root/reference}
HERE="$(cd "$(dirname "$0")" && pwd)"
BUILD="$HERE/../.build"
mkdir -p "$BUILD"

if [[ -x "$BUILD/ngsLD_ref" && "$BUILD/ngsLD_ref" -nt "$HERE/gsl/gsl_rng.h" ]]; then
  echo "$BUILD/ngsLD_ref"
  exit 0
fi

CXXFLAGS="-O3 -w -D_FILE_OFFSET_BITS=64 -D_LARGEFILE64_SOURCE -I$REF/shared -I$HERE"
cd "$BUILD"
g++ $CXXFLAGS -c "$REF/shared/gen_func.cpp" -o gen_func.o
g++ $CXXFLAGS -c "$REF/shared/read_data.cpp" -o read_data.o
g++ $CXXFLAGS -c "$REF/shared/threadpool.c" -o threadpool.o
g++ $CXXFLAGS -c "$REF/parse_args.cpp" -o parse_args.o
g++ $CXXFLAGS -c "$REF/ngsLD.cpp" -o ngsLD.o
g++ $CXXFLAGS gen_func.o read_data.o threadpool.o parse_args.o ngsLD.o -lz -lpthread -o ngsLD_ref
echo "$BUILD/ngsLD_ref"
