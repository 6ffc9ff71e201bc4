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

# persistent XLA compile cache for the TEST harness: the suite's wall time is
# dominated by CPU jit compiles (measured: test_camera.py 197s cold / 60s
# warm on the 1-CPU CI host). The library itself leaves the CPU cache off
# (utils/jaxcache.py — AOT artifacts are machine-feature sensitive), but a
# per-machine cache populated and read on the SAME host is safe.
if os.environ.get("FIGDRAW_TEST_TPU") != "1":
    _cache = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "figdraw_tpu_jax", "cpu-tests")
    os.makedirs(_cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
