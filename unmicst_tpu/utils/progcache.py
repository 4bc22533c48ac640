"""Bounded, thread-safe cache for compiled programs.

Long-running services (serve.py) and sweeps see many slide geometries;
every compiled program pins host RAM and HBM, so both engines bound their
program caches with FIFO eviction and serialize builds under a lock
(concurrent first requests for one geometry must not compile twice).
"""

from __future__ import annotations

import collections
import threading
from typing import Callable, Hashable


class ProgramCache:
    def __init__(self, max_entries: int = 16):
        self.max_entries = int(max_entries)
        self._entries: "collections.OrderedDict" = collections.OrderedDict()
        # reentrant: a build may itself consult the cache (the raw-slide
        # program wraps the core canvas program)
        self._lock = threading.RLock()

    def get_or_build(self, key: Hashable, build: Callable):
        with self._lock:
            hit = self._entries.get(key)
            if hit is not None:
                return hit
            # build under the lock: compiles are expensive and duplicate
            # concurrent builds of one geometry would each pin memory
            value = build()
            self._entries[key] = value
            while len(self._entries) > self.max_entries:
                self._entries.popitem(last=False)
            return value
