#!/usr/bin/env bash
# ASan/UBSan fuzz of the native typesetter C ABI (fd_pack_load,
# fd_utf8_to_cps, fd_typeset_box_make + the whole fd_arr_* arrangement
# query suite). Builds a sanitized .so and drives it with adversarial
# inputs — out-of-range indices, cap=0 count queries, undersized caps,
# NULL output mixes, truncated and bit-flipped packs (shaping on
# corrupted-but-accepted packs included). Not part of the default test
# suite (needs a sanitizer build); run manually after touching
# native/typeset.cpp:
#
#   ./native/fuzz/run_asan_fuzz.sh
#
# Exits non-zero on any OOB read/write, UB trap, or contract assert.
set -euo pipefail
cd "$(dirname "$0")/../.."

so=/tmp/libfigdraw_typeset_asan.so
g++ -O1 -g -shared -fPIC -std=c++17 -ffp-contract=off \
    -fsanitize=address,undefined -fno-sanitize-recover=all \
    native/typeset.cpp -o "$so"

PYTHONPATH= JAX_PLATFORMS=cpu \
LD_PRELOAD="$(g++ -print-file-name=libasan.so)" \
ASAN_OPTIONS=detect_leaks=0 \
python native/fuzz/fuzz_typeset_asan.py
