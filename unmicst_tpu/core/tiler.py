"""Overlap-tiled image partitioning — the PI2D successor, device-resident.

Behavioral spec: ``toolbox/PartitionOfImage.py:6-147`` (class ``PI2D``).
The reference cuts a zero-padded image into ``patchSize`` tiles at stride
``subPatchSize = patchSize - 2*margin``, runs the net per tile, multiplies
each prediction by a linear-ramp window ``W`` and accumulates ``sum(P*W)``
and ``sum(W)`` in numpy, then divides and crops (``:92-122``).

This module re-architects that as three pure, jit-able array ops:

* :func:`ramp_window` — the exact reference weight window (``:30-39``),
* :func:`unfold` — gather all tiles of a padded canvas with reshape/slice/concat data movement (no gather),
* :func:`fold` — vectorized overlap-add of weighted tiles back onto the
  canvas.  Because ``margin = patchSize // 8`` (``UnMicst.py:527``) implies
  ``sub >= 2*margin``, each output pixel is covered by at most 2 tiles per
  axis, so the scatter-add decomposes into two shifted dense adds per axis —
  no serial scatter, no atomics, fully fused by XLA on TPU.

All functions are shape-static given a :class:`TileGrid`, so they compile
once per geometry.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TileGrid:
    """Static tile geometry (mirrors ``PI2D.setup``, ``PartitionOfImage.py:23-75``)."""

    height: int  # original image rows (NR)
    width: int  # original image cols (NC)
    patch: int  # PatchSize
    margin: int  # Margin

    @property
    def sub(self) -> int:
        return self.patch - 2 * self.margin

    @property
    def npr(self) -> int:
        return -(-self.height // self.sub)

    @property
    def npc(self) -> int:
        return -(-self.width // self.sub)

    @property
    def padded_height(self) -> int:  # NRPI
        return self.npr * self.sub + 2 * self.margin

    @property
    def padded_width(self) -> int:  # NCPI
        return self.npc * self.sub + 2 * self.margin

    @property
    def num_tiles(self) -> int:
        return self.npr * self.npc

    def __post_init__(self):
        if self.height <= 0 or self.width <= 0:
            raise ValueError(f"empty image: {self.height}x{self.width}")
        if self.margin < 1:
            # margin=0 gives non-overlapping tiles whose window is still
            # zero on the outer ring -> zero blend count along every seam
            # (NaN stripes after the divide); negatives mis-slice tiles
            raise ValueError(f"margin must be >= 1, got {self.margin}")
        if self.patch <= 2 * self.margin:
            raise ValueError("patch must exceed 2*margin")
        if self.sub < 2 * self.margin:
            raise ValueError(
                "vectorized overlap-add requires sub >= 2*margin "
                f"(patch={self.patch}, margin={self.margin}); the reference "
                "geometry margin=patch//8 always satisfies this"
            )


def make_grid(height: int, width: int, patch: int, margin: int) -> TileGrid:
    return TileGrid(height=height, width=width, patch=patch, margin=margin)


def ramp_window(patch: int, margin: int, dtype=np.float32) -> np.ndarray:
    """The PI2D blend window, bit-for-bit (``PartitionOfImage.py:30-39``).

    Zero on the outermost ring, then linear ramp ``i / (2*margin)`` on ring
    ``i`` for ``i in 1..2*margin-1``, ones inside.

    Returns **numpy** deliberately: jitted callers must take it as an
    argument or embed it as a literal — a device-resident closure constant
    forces a device->host fetch at lowering time, which is pathologically
    slow on tunneled TPU runtimes.
    """
    w = np.ones((patch, patch), np.float64)
    w[[0, -1], :] = 0
    w[:, [0, -1]] = 0
    for i in range(1, 2 * margin):
        v = i / (2 * margin)
        w[i, i:-i] = v
        w[-i - 1, i:-i] = v
        w[i:-i, i] = v
        w[i:-i, -i - 1] = v
    return np.asarray(w, dtype)


def pad_canvas(image: jnp.ndarray, grid: TileGrid) -> jnp.ndarray:
    """Zero-pad ``[H, W, C]`` to the tile canvas with a ``margin`` top-left
    offset (``PartitionOfImage.py:58-63``)."""
    if image.shape[:2] != (grid.height, grid.width):
        # a mismatched grid would otherwise pad/misplace silently (small
        # image: zero rows blended into "valid" output; large: cryptic
        # negative-pad error)
        raise ValueError(
            f"image {image.shape[:2]} does not match grid "
            f"{(grid.height, grid.width)}"
        )
    h_pad = grid.padded_height - grid.height - grid.margin
    w_pad = grid.padded_width - grid.width - grid.margin
    return jnp.pad(
        image,
        ((grid.margin, h_pad), (grid.margin, w_pad)) + ((0, 0),) * (image.ndim - 2),
    )


def _unfold_axis(x: jnp.ndarray, n: int, sub: int, patch: int) -> jnp.ndarray:
    """Split the leading axis into ``n`` overlapping windows of ``patch``.

    ``[n*sub + 2m, ...] -> [n, patch, ...]`` using only reshape + slice +
    concat (no gather — XLA lowers these to pure data movement on TPU).
    Requires ``sub >= patch - sub`` (guaranteed by TileGrid).
    """
    two_m = patch - sub
    main = x[: n * sub].reshape((n, sub) + x.shape[1:])
    # tail window i covers rows [(i+1)*sub, (i+1)*sub + 2m); the shifted view
    # has (n-1)*sub + 2m rows — pad to n*sub so it reshapes into n chunks
    shifted = x[sub:]
    pad = [(0, n * sub - shifted.shape[0])] + [(0, 0)] * (x.ndim - 1)
    tail = jnp.pad(shifted, pad).reshape((n, sub) + x.shape[1:])[:, :two_m]
    return jnp.concatenate([main, tail], axis=1)


def unfold(padded: jnp.ndarray, grid: TileGrid) -> jnp.ndarray:
    """Extract all tiles: ``[H', W', C] -> [npr, npc, P, P, C]``."""
    t = _unfold_axis(padded, grid.npr, grid.sub, grid.patch)  # (npr, P, W', C)
    t = jnp.moveaxis(t, 2, 0)  # (W', npr, P, C)
    t = _unfold_axis(t, grid.npc, grid.sub, grid.patch)  # (npc, Pc, npr, Pr, C)
    return jnp.transpose(
        t, (2, 0, 3, 1) + tuple(range(4, t.ndim))
    )  # (npr, npc, Pr, Pc, C)


def _fold_axis(tiles: jnp.ndarray, sub: int) -> jnp.ndarray:
    """Overlap-add along the leading (tile, pixel) axis pair.

    ``tiles``: [n, P, ...] where consecutive tiles overlap by ``P - sub``
    pixels (the shapes are the single source of truth for the overlap).
    Returns [n*sub + (P - sub), ...].
    """
    n, patch = tiles.shape[0], tiles.shape[1]
    two_m = patch - sub
    main = tiles[:, :sub]  # (n, sub, ...)
    tail = tiles[:, sub:]  # (n, 2m, ...)
    # tail of tile k-1 lands on the first 2m pixels of chunk k
    pad_spec = [(1, 0), (0, sub - two_m)] + [(0, 0)] * (tiles.ndim - 2)
    add = jnp.pad(tail[:-1], pad_spec)
    chunks = (main + add).reshape((n * sub,) + tiles.shape[2:])
    return jnp.concatenate([chunks, tail[-1]], axis=0)


def fold(tiles: jnp.ndarray, grid: TileGrid) -> jnp.ndarray:
    """Overlap-add tiles back to the canvas.

    ``[npr, npc, P, P, ...] -> [H', W', ...]``.  Callers pre-multiply tiles
    by the blend window (and a validity mask for phantom tiles when the grid
    is padded for batching).
    """
    t = jnp.moveaxis(tiles, 1, 2)  # (npr, Pr, npc, Pc, ...)
    t = _fold_axis(t, grid.sub)  # (H', npc, Pc, ...)
    t = jnp.moveaxis(t, 0, 2)  # (npc, Pc, H', ...)
    t = _fold_axis(t, grid.sub)  # (W', H', ...)
    return jnp.swapaxes(t, 0, 1)  # (H', W', ...)


@functools.lru_cache(maxsize=32)
def _count_map_jit(grid_key):
    grid = TileGrid(*grid_key)

    def impl(win):
        tiles = jnp.broadcast_to(
            win[None, None], (grid.npr, grid.npc, grid.patch, grid.patch)
        )
        return fold(tiles, grid)

    return jax.jit(impl)


def count_map(grid: TileGrid, window: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel sum of overlapping blend windows (PI2D ``Count``).

    Jitted (cached per grid): called eagerly the broadcast would
    materialize the full (npr, npc, P, P) stack on device; under jit XLA
    fuses it into the fold adds."""
    return _count_map_jit(dataclasses.astuple(grid))(window)


def crop_valid(canvas: jnp.ndarray, grid: TileGrid) -> jnp.ndarray:
    """Crop the margin offset back to the original H x W
    (``PartitionOfImage.py:108-122``)."""
    m = grid.margin
    return canvas[m : m + grid.height, m : m + grid.width]
