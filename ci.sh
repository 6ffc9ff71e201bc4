#!/usr/bin/env bash
# figdraw_tpu verification pipeline — the committed twin of the reference's
# .github/workflows/build-full.yml (7-leg matrix on software GL/Vulkan).
# Our legs: true-CPU full suite (the LLVMpipe analog), golden-frame fidelity
# (XLA + Pallas-interpret), the driver's multichip dry run on a virtual
# 8-device mesh, and the native flattener build. Run from the repo root:
#
#   ./ci.sh            # everything (~11 min warm / ~30 min on a cold
#                      # compile cache — tests/conftest.py keeps a
#                      # persistent XLA cache under ~/.cache)
#   ./ci.sh fast       # -m "not slow": skips the heavyweight frame-loop
#                      # suites (sub-10-min tier, pyproject.toml markers)
#   ./ci.sh quick      # smoke: goldens + dryrun only (~4 min)
#
# On a machine with a real TPU attached, add FIGDRAW_TEST_TPU=1 to run the
# suite against the chip instead of forcing CPU (see tests/conftest.py), and
# `python bench.py` for the perf number.
set -euo pipefail
cd "$(dirname "$0")"

# true-CPU jax: the axon sitecustomize force-registers the TPU plugin via
# PYTHONPATH, so clear it (CLAUDE.md "Environment gotchas")
export PYTHONPATH=
export JAX_PLATFORMS=cpu

mode="${1:-full}"

echo "== native flattener build =="
python -c "import figdraw_tpu.native as n; assert n.available(), 'libfigdraw_flatten.so failed to build'; print('native OK')"

if [ "$mode" = "fast" ]; then
  echo "== fast suite (true CPU, -m 'not slow') =="
  python -m pytest tests/ -q -m "not slow"
elif [ "$mode" != "quick" ]; then
  echo "== full suite (true CPU) =="
  python -m pytest tests/ -q
else
  echo "== golden fidelity (XLA + Pallas interpret) =="
  python -m pytest tests/test_golden.py tests/test_golden_layers.py \
      tests/test_golden_overlay.py tests/test_shaping_reference_fonts.py -q
fi

echo "== multichip dry run (virtual 8-device mesh) =="
XLA_FLAGS=--xla_force_host_platform_device_count=8 N_DEVICES=8 \
    python __graft_entry__.py

echo "CI green"
