"""Persistent XLA compilation cache setup.

First compiles through this environment's TPU tunnel are slow (remote AOT
compile); the persistent cache makes repeated CLI invocations (train, infer,
bench) reuse serialized executables across processes.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "STE_COMPILATION_CACHE", os.path.expanduser("~/.cache/ste_tpu_xla"))


def enable(cache_dir: str = _DEFAULT_DIR) -> None:
    import jax
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax or read-only fs: just skip caching
