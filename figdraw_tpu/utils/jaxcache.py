"""Persistent JAX compilation cache setup.

Remote TPU compiles through the axon tunnel cost tens of seconds each; the
on-disk cache makes every jit signature a one-time cost per machine.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "figdraw_tpu_jax")


def enable_compilation_cache(path: str | None = None) -> None:
    if os.environ.get("FIGDRAW_NO_JAX_CACHE") == "1":
        return
    import jax

    try:
        backend = jax.default_backend()
    except Exception:
        return
    if backend != "tpu":
        # CPU compiles are fast, and CPU AOT artifacts are machine-feature
        # sensitive (loading one compiled under a different feature set warns
        # about possible SIGILL); only remote TPU compiles are worth caching.
        return
    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    cache_dir = os.path.join(cache_dir, backend)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
