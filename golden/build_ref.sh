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
#
# Sources are staged+patched in /tmp; nothing from the reference tree is
# copied into the repository.
set -euo pipefail
cd "$(dirname "$0")"

STAGE=/tmp/ref_build
rm -rf "$STAGE"
mkdir -p "$STAGE"
cp -r /root/reference/include "$STAGE/include"
cp -r /root/reference/src "$STAGE/src"

# single-threaded build (see header comment)
sed -i 's/#define MULTITHREAD\t1/#define MULTITHREAD 0/' "$STAGE/include/global.hpp"
grep -q "MULTITHREAD 0" "$STAGE/include/global.hpp" || {
  echo "patch failed"; exit 1; }

FLAGS="-O2 -std=c++17 -fopenmp -include prelude.h -pthread"
g++ $FLAGS -I"$STAGE/include" -o ref_cornell_st "$STAGE/src/main_cornellBox.cpp"
g++ $FLAGS -I"$STAGE/include" -o ref_veach_st "$STAGE/src/main.cpp"
echo "built ref_cornell_st ref_veach_st"
