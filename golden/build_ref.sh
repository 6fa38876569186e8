#!/bin/bash
# Build the reference renderer as a golden-image oracle.
#
# The reference does not build/run as-is on Linux:
#  - std::powf is MSVC-only (shimmed by prelude.h);
#  - the std::thread arg struct is scoped inside the spawn loop and read
#    after scope exit (PathTracing.hpp:10-12) — AddressSanitizer-confirmed
#    stack-use-after-scope, segfaults under g++. We flip MULTITHREAD to 0,
#    which also selects the single-thread pixel-center math (the variant
#    without the double-c_off_v bug) that the TPU renderer implements.
#  - main.cpp loads "veach_slight.obj" but the asset is "veach_sLight.obj"
#    (main.cpp:49) — fine on case-insensitive Windows, broken on Linux; the
#    staged model tree gets a lowercase copy.
#
# Everything reference-derived (sources, patched headers, model assets,
# and the built binaries' run directory) is STAGED into /tmp/ref_build;
# the binaries land in golden/ but are gitignored — only the .ppm oracle
# outputs and the tiny config files are tracked.
set -euo pipefail
cd "$(dirname "$0")"

STAGE=/tmp/ref_build
rm -rf "$STAGE"
mkdir -p "$STAGE"
cp -r /root/reference/include "$STAGE/include"
cp -r /root/reference/src "$STAGE/src"
cp -r /root/reference/model "$STAGE/model"
# case-sensitivity fix for the veach scene (main.cpp:49)
cp "$STAGE/model/veach_bdpt/veach_sLight.obj" \
   "$STAGE/model/veach_bdpt/veach_slight.obj"

# single-threaded build (see header comment)
sed -i 's/#define MULTITHREAD\t1/#define MULTITHREAD 0/' "$STAGE/include/global.hpp"
grep -q "MULTITHREAD 0" "$STAGE/include/global.hpp" || {
  echo "patch failed"; exit 1; }

FLAGS="-O2 -std=c++17 -fopenmp -include prelude.h -pthread"
g++ $FLAGS -I"$STAGE/include" -o ref_cornell_st "$STAGE/src/main_cornellBox.cpp"
g++ $FLAGS -I"$STAGE/include" -o ref_veach_st "$STAGE/src/main.cpp"
echo "built ref_cornell_st ref_veach_st"
echo "run from $STAGE/src so ../model resolves to the staged assets, e.g.:"
echo "  (cd $STAGE/src && /root/repo/golden/ref_cornell_st /root/repo/golden/cornell_128.txt)"
