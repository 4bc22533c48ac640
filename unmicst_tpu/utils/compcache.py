"""Persistent XLA compilation cache.

TPU compiles through the tunneled runtime cost 10-200s; caching them on
disk makes repeat CLI invocations and driver bench runs near-instant.

The cache directory is keyed by a HOST CPU fingerprint: XLA:CPU
serializes AOT executables specialized to the compiling machine's
vector features, and loading them on a different host only WARNS
("could lead to execution errors such as SIGILL") — observed once as
silently wrong int8 numerics when a cache dir written on another
driver host was reused here (2026-08-20).  TPU executables are
host-independent, but a host switch is rare and one cold compile set
is cheaper than cross-machine miscompiles; entries simply rebuild
under the new key.
"""

from __future__ import annotations

import hashlib
import os
import platform

_DEFAULT_DIR = os.path.expanduser("~/.cache/unmicst_tpu_xla")
_enabled = False


def _host_key() -> str:
    """Fingerprint of the CPU features XLA:CPU specializes against."""
    ident = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    ident += ":" + line
                    break
    except OSError:
        ident += ":" + platform.processor()
    return hashlib.sha1(ident.encode()).hexdigest()[:12]


def enable(cache_dir: str = _DEFAULT_DIR) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    try:
        cache_dir = os.path.join(cache_dir, f"host-{_host_key()}")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:
        pass  # older jax or read-only fs: soft-fail
