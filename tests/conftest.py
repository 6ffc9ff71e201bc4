"""Test harness config: force JAX onto a virtual 8-device CPU mesh.

Tests must run without TPU hardware; multi-chip sharding tests use
xla_force_host_platform_device_count (the reference's analog is headless
LLVMpipe CI, SURVEY.md §4.4).
"""

import os
import sys

# force CPU: the environment pre-sets JAX_PLATFORMS=axon (TPU tunnel) and its
# sitecustomize ignores the env var; the config API still wins. Remote TPU
# compiles through the tunnel cost 1-10 min per jit signature — tests never
# want that. Set FIGDRAW_TEST_TPU=1 to run the suite against the real chip.
if os.environ.get("FIGDRAW_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
