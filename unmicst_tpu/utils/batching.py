"""Chunked batched forward: full-size ``lax.map`` chunks + one remainder.

Padding tile batches up to a fixed chunk wastes forward FLOPs (the r1
engines padded 16k-legacy stripes by +33%), while shrinking chunks to
balance them loses the measured per-tile efficiency of full
``tile_batch``-sized batches (~25% between chunk 171 and 256 on v5e, see
BASELINE.md stripe-autotune table).  Running ``floor(n / chunk)`` full
chunks under ``lax.map`` plus ONE static-shape remainder batch gets both:
zero padding, bulk of tiles at the optimal rate.  Everything is static
shapes — XLA compiles exactly two forward programs per geometry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` >= ``x`` (shared by the stripe planners)."""
    return -(-x // m) * m


def chunked_forward(forward, flat, chunk: int):
    """Apply ``forward`` ([B, ...] -> [B, ...out]) over ``flat`` [N, ...]
    in full ``chunk``-sized pieces plus one remainder batch; returns
    [N, ...out].  N and chunk are static (trace-time) values."""
    n = int(flat.shape[0])
    if n <= chunk:
        return forward(flat)
    n_full, rem = divmod(n, chunk)
    chunks = flat[: n_full * chunk].reshape((n_full, chunk) + flat.shape[1:])
    out = jax.lax.map(forward, chunks)
    main = out.reshape((n_full * chunk,) + out.shape[2:])
    if not rem:
        return main
    return jnp.concatenate([main, forward(flat[n_full * chunk :])])
