"""Bounded, thread-safe cache for compiled programs.

Long-running services (serve.py) and sweeps see many slide geometries;
every compiled program pins host RAM and HBM, so both engines bound their
program caches with FIFO eviction.  Builds are deduplicated per key (two
concurrent first requests for one geometry compile once) but run OFF the
global lock: a cache hit for an already-compiled key must not block behind
an unrelated key's 10-200 s compile (see utils/compcache.py for the
tunnel compile-time numbers).
"""

from __future__ import annotations

import collections
import threading
from typing import Callable, Hashable


class _Pending:
    __slots__ = ("event", "value", "error")

    def __init__(self):
        self.event = threading.Event()
        self.value = None
        self.error = None


class ProgramCache:
    def __init__(self, max_entries: int = 16):
        self.max_entries = int(max_entries)
        self._entries: "collections.OrderedDict" = collections.OrderedDict()
        self._pending: dict = {}
        # guards the two dicts only — never held across a build, so hits
        # and unrelated builds proceed while one key compiles; nested
        # get_or_build from inside a build (the raw-slide program wraps the
        # core canvas program) is therefore also lock-safe
        self._lock = threading.Lock()

    def get_or_build(self, key: Hashable, build: Callable):
        while True:
            with self._lock:
                hit = self._entries.get(key)
                if hit is not None:
                    return hit
                pending = self._pending.get(key)
                if pending is None:
                    pending = self._pending[key] = _Pending()
                    owner = True
                else:
                    owner = False
            if owner:
                break
            pending.event.wait()
            if pending.error is None:
                return pending.value
            # the owner's build failed: surface the same error (a retry
            # would stampede a deterministically-failing compile)
            raise pending.error
        try:
            value = build()
        except BaseException as exc:
            with self._lock:
                self._pending.pop(key, None)
            pending.error = exc
            pending.event.set()
            raise
        with self._lock:
            self._entries[key] = value
            self._pending.pop(key, None)
            while len(self._entries) > self.max_entries:
                self._entries.popitem(last=False)
        pending.value = value
        pending.event.set()
        return value
