"""Test harness config: force JAX onto a virtual 8-device CPU mesh.

Tests must run without TPU hardware; multi-chip sharding tests use
xla_force_host_platform_device_count (the reference's analog is headless
LLVMpipe CI, SURVEY.md §4.4).
"""

import os
import sys

# force CPU: the environment pre-sets JAX_PLATFORMS=axon (TPU tunnel), whose
# backend init alone costs ~80 s — tests never want it. Set FIGDRAW_TEST_TPU=1
# to run the suite against the real chip.
if os.environ.get("FIGDRAW_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
