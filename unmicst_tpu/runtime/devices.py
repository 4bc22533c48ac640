"""Device discovery/selection — the ``toolbox/GPUselect.py`` analogue.

The reference scans NVML for the GPU with the most free memory
(``GPUselect.py:4-22``) and pins ``CUDA_VISIBLE_DEVICES``
(``UnMicst.py:577-595``).  On TPU hosts the runtime owns all local chips,
so "selection" reduces to choosing a device index or restricting the
process; memory-based ranking is still provided where the backend exposes
memory stats.
"""

from __future__ import annotations


import jax


def pick_device_most_free_memory() -> jax.Device:
    """Device with the most free memory (falls back to device 0)."""
    best, best_free = None, -1
    for dev in jax.local_devices():
        try:
            stats = dev.memory_stats() or {}
            free = stats.get("bytes_limit", 0) - stats.get("bytes_in_use", 0)
        except (RuntimeError, AttributeError):
            free = 0
        if free > best_free:
            best, best_free = dev, free
    return best or jax.local_devices()[0]


def select_device(index: int = -1) -> jax.Device:
    """``--GPU``-flag semantics: explicit index, or auto-pick with -1."""
    devices = jax.local_devices()
    if index < 0:
        return pick_device_most_free_memory()
    if index >= len(devices):
        raise ValueError(f"device {index} requested; {len(devices)} available")
    return devices[index]


def describe() -> str:
    # local_devices, not devices: the printed [i] must be valid --GPU
    # arguments, and select_device indexes the LOCAL list (on a multi-host
    # topology the global list is longer and differently ordered)
    return ", ".join(
        f"[{i}] {d.platform}:{d.device_kind}"
        for i, d in enumerate(jax.local_devices())
    )
