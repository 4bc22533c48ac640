"""Persistent XLA compilation cache.

TPU compiles through the tunneled runtime cost 10-200s; caching them on
disk makes repeat CLI invocations and driver bench runs near-instant.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/unmicst_tpu_xla")
_enabled = False


def enable(cache_dir: str = _DEFAULT_DIR) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:
        pass  # older jax or read-only fs: soft-fail
