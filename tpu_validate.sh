#!/usr/bin/env bash
# One-shot real-TPU validation + benchmark sweep (the chip-attached leg of
# ci.sh). Run when the axon tunnel is up; every step is individually
# timeout-bounded so a tunnel stall can't wedge the run. Results append to
# out/tpu_validate.log with timestamps.
#
#   ./tpu_validate.sh           # hardware test subset + all benches
#   ./tpu_validate.sh bench     # benches only
set -uo pipefail
cd "$(dirname "$0")"
mkdir -p out
log=out/tpu_validate.log
say() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$log"; }

say "== TPU probe =="
if ! timeout 110 python -c "import jax; print(jax.devices())" >>"$log" 2>&1; then
  say "TPU tunnel unreachable — aborting"
  exit 1
fi

mode="${1:-full}"

if [ "$mode" != "bench" ]; then
  say "== hardware test subset (FIGDRAW_TEST_TPU=1) =="
  # the kernel/golden/parity/retained classes that exercise real Mosaic
  # compiles, donation, and the tunnel transport
  timeout 3000 env FIGDRAW_TEST_TPU=1 python -m pytest \
      tests/test_raster.py tests/test_mega.py tests/test_golden.py \
      tests/test_retained.py tests/test_camera.py tests/test_batch.py \
      -q 2>&1 | tail -3 | tee -a "$log"
fi

say "== bench.py (headline 300-box) =="
timeout 900 python bench.py 2>&1 | tee -a "$log"
say "== bench.py 40x scale =="
timeout 900 env FIGDRAW_BENCH_COPIES=4000 python bench.py 2>&1 | tee -a "$log"
say "== bench_camera =="
timeout 900 python bench_camera.py 2>&1 | tee -a "$log"
say "== bench_retained =="
timeout 900 python bench_retained.py 2>&1 | tee -a "$log"
say "== bench_anim =="
timeout 900 python bench_anim.py 2>&1 | tee -a "$log"
say "== bench_clipmask =="
timeout 900 python bench_clipmask.py 2>&1 | tee -a "$log"
say "TPU validation done"
