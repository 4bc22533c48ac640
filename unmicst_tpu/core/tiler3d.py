"""3D overlap tiling — the ``PI3D`` successor (``PartitionOfImage.py:150-304``).

The reference ships a volumetric analogue of PI2D (cubic ramp window,
z/r/c tile grid) that no CLI uses; it exists for volumetric models.  Ported
to the same pure-array design as :mod:`unmicst_tpu.core.tiler`: gather
unfold + per-axis two-shift overlap-add fold, fully vectorized and
jit-able.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TileGrid3D:
    depth: int  # NZ
    height: int  # NR
    width: int  # NC
    patch: int
    margin: int

    @property
    def sub(self) -> int:
        return self.patch - 2 * self.margin

    @property
    def npz(self) -> int:
        return -(-self.depth // self.sub)

    @property
    def npr(self) -> int:
        return -(-self.height // self.sub)

    @property
    def npc(self) -> int:
        return -(-self.width // self.sub)

    @property
    def padded(self):
        m2 = 2 * self.margin
        return (
            self.npz * self.sub + m2,
            self.npr * self.sub + m2,
            self.npc * self.sub + m2,
        )

    def __post_init__(self):
        # same guards as the 2D TileGrid (tiler.py): margin=0 zeroes the
        # window's outer ring -> zero blend count on every seam plane (NaN
        # after the divide); negatives mis-slice every tile
        if self.depth <= 0 or self.height <= 0 or self.width <= 0:
            raise ValueError(
                f"empty volume: {self.depth}x{self.height}x{self.width}"
            )
        if self.margin < 1:
            raise ValueError(f"margin must be >= 1, got {self.margin}")
        if self.patch <= 2 * self.margin:
            raise ValueError("patch must exceed 2*margin")
        if self.sub < 2 * self.margin:
            raise ValueError("3D overlap-add requires sub >= 2*margin")


def make_grid3d(depth, height, width, patch, margin) -> TileGrid3D:
    return TileGrid3D(depth, height, width, patch, margin)


def ramp_window3d(patch: int, margin: int, dtype=np.float32) -> np.ndarray:
    """The PI3D cubic weight window, bit-for-bit (``:176-186``).

    Returns numpy (repo convention: constants entering jitted code must
    not be device arrays — see ``tiler.ramp_window``)."""
    w = np.ones((patch, patch, patch))
    w[[0, -1], :, :] = 0
    w[:, [0, -1], :] = 0
    w[:, :, [0, -1]] = 0
    for i in range(1, 2 * margin):
        v = i / (2 * margin)
        w[[i, -i - 1], i:-i, i:-i] = v
        w[i:-i, [i, -i - 1], i:-i] = v
        w[i:-i, i:-i, [i, -i - 1]] = v
    return np.asarray(w, dtype)


def pad_canvas3d(volume: jnp.ndarray, grid: TileGrid3D) -> jnp.ndarray:
    if volume.shape[:3] != (grid.depth, grid.height, grid.width):
        # mirror pad_canvas: a mismatched grid would pad/misplace silently
        raise ValueError(
            f"volume {volume.shape[:3]} does not match grid "
            f"{(grid.depth, grid.height, grid.width)}"
        )
    pz, pr, pc = grid.padded
    m = grid.margin
    pads = [
        (m, pz - grid.depth - m),
        (m, pr - grid.height - m),
        (m, pc - grid.width - m),
    ] + [(0, 0)] * (volume.ndim - 3)
    return jnp.pad(volume, pads)


def _idx(n: int, sub: int, patch: int) -> np.ndarray:
    # numpy by convention: device-array constants in jitted callers cost a
    # device->host fetch at lowering on tunneled runtimes (see tiler)
    return np.arange(n)[:, None] * sub + np.arange(patch)[None, :]


def unfold3d(padded: jnp.ndarray, grid: TileGrid3D) -> jnp.ndarray:
    """[Z', H', W', ...] -> [npz, npr, npc, P, P, P, ...]."""
    zi = _idx(grid.npz, grid.sub, grid.patch)
    ri = _idx(grid.npr, grid.sub, grid.patch)
    ci = _idx(grid.npc, grid.sub, grid.patch)
    t = padded[zi]  # (npz, P, H', W', ...)
    t = t[:, :, ri]  # (npz, P, npr, P, W', ...)
    t = t[:, :, :, :, ci]  # (npz, P, npr, P, npc, P, ...)
    return jnp.moveaxis(jnp.moveaxis(t, 2, 1), 4, 2)


def _fold_axis(tiles: jnp.ndarray, sub: int) -> jnp.ndarray:
    from unmicst_tpu.core.tiler import _fold_axis as _fold2d

    return _fold2d(tiles, sub)  # overlap comes from the tile shapes


def fold3d(tiles: jnp.ndarray, grid: TileGrid3D) -> jnp.ndarray:
    """[npz, npr, npc, Pz, Pr, Pc, ...] -> [Z', H', W', ...]."""
    t = jnp.moveaxis(tiles, 3, 1)  # (npz, Pz, npr, npc, Pr, Pc, ...)
    t = _fold_axis(t, grid.sub)  # (Z', npr, npc, Pr, Pc, ...)
    t = jnp.moveaxis(jnp.moveaxis(t, 1, 0), 3, 1)  # (npr, Pr, Z', npc, Pc, ...)
    t = _fold_axis(t, grid.sub)  # (H', Z', npc, Pc, ...)
    t = jnp.moveaxis(jnp.moveaxis(t, 2, 0), 3, 1)  # (npc, Pc, H', Z', ...)
    t = _fold_axis(t, grid.sub)  # (W', H', Z', ...)
    return jnp.moveaxis(t, (0, 1, 2), (2, 1, 0))  # (Z', H', W', ...)


@functools.lru_cache(maxsize=32)
def _count_map3d_jit(grid_key):
    grid = TileGrid3D(*grid_key)

    def impl(win):
        tiles = jnp.broadcast_to(
            win[None, None, None],
            (grid.npz, grid.npr, grid.npc) + win.shape,
        )
        return fold3d(tiles, grid)

    return jax.jit(impl)


def count_map3d(grid: TileGrid3D, window: jnp.ndarray) -> jnp.ndarray:
    """Per-voxel sum of overlapping blend windows (PI3D ``Count``).

    Jitted (cached per grid) like the 2D ``count_map``: eagerly the
    broadcast would materialize the full (npz, npr, npc, P, P, P) stack on
    device; under jit XLA fuses it into the fold adds."""
    return _count_map3d_jit(dataclasses.astuple(grid))(window)


def crop_valid3d(canvas: jnp.ndarray, grid: TileGrid3D) -> jnp.ndarray:
    m = grid.margin
    return canvas[
        m : m + grid.depth, m : m + grid.height, m : m + grid.width
    ]
