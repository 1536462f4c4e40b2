#!/bin/sh
# Build the native TUM decode library (SURVEY.md §2b N1).
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -o ../tpuslam/data/_libtum_native.so tum_decode.cc -lpng -lz
echo "built tpuslam/data/_libtum_native.so"
