"""Tracing / profiling / numerics-checking utilities (SURVEY #5).

The reference has no profiling at all (``print`` progress only,
``UnMicst.py:466,503-504``).  Here:

* :class:`StageTimer` — per-stage wall-clock (read / H2D / compute / blend /
  write) with Mpx/s reporting; used by the CLI ``--stats`` path.
* :func:`trace` — context manager around ``jax.profiler`` trace capture
  (view with TensorBoard or xprof).
* :func:`start_server` — live ``jax.profiler`` server for attaching from a
  remote profiler UI.
* :func:`check_numerics` — optional NaN/Inf scan over a pytree (the
  deterministic-runtime stand-in for a sanitizer; SURVEY #5 race row).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import numpy as np


class StageTimer:
    """Accumulating named stage timer.

    >>> t = StageTimer()
    >>> with t.stage("read"): ...
    >>> t.report(mpx=400.0)
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + (
                time.perf_counter() - start
            )

    @property
    def total(self) -> float:
        return time.perf_counter() - self._t0

    def report(self, mpx: Optional[float] = None) -> str:
        parts = [f"{k} {v:.2f}s" for k, v in self.totals.items()]
        line = " | ".join(parts) + f" | total {self.total:.2f}s"
        if mpx is not None and self.total > 0:
            line += f" | {mpx / self.total:.1f} Mpx/s"
        return line


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Start the live profiler server (attach with xprof/TensorBoard)."""
    return jax.profiler.start_server(port)


def check_numerics(tree, name: str = "tree") -> None:
    """Raise if any leaf contains NaN/Inf (opt-in ``--check_numerics`` mode)."""
    bad = []

    def visit(path, leaf):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            n_bad = int((~np.isfinite(arr)).sum())
            bad.append(f"{jax.tree_util.keystr(path)}: {n_bad} non-finite")

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: " + "; ".join(bad))
