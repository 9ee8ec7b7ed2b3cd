"""Persistent XLA compile cache (the wave kernels take minutes to compile
on the axon TPU toolchain; cached binaries reload in seconds)."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `path` (default
    ~/.cache/damapper_tpu/xla).  Safe to call multiple times."""
    import jax

    if path is None:
        path = os.environ.get(
            "DAMAPPER_XLA_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "damapper_tpu",
                         "xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
