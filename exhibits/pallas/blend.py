"""Pallas TPU kernel: fused window-weight + overlap-add blend.

The blend stage of tiled inference (``PartitionOfImage.py:92-106``:
``Output += P*W``) is memory-bound elementwise work.  The XLA path
(:func:`unmicst_tpu.core.tiler.fold`) expresses it as shifted dense adds
with pad/concat intermediates; this kernel walks tiles on the sequential
TPU grid and read-modify-writes each tile's ``patch x patch`` window of
the HBM output canvas through VMEM — one pass, window multiply fused with
the accumulate, no intermediates.

Because tile windows overlap at stride ``sub < patch``, the windows are
not expressible as disjoint BlockSpec blocks; the canvas therefore stays
in HBM (``memory_space=ANY``) and each grid step DMAs its window in and
out explicitly.  TPU grid steps run sequentially on a core, so the
overlapping read-modify-writes are race-free by construction.

Status: numerically verified against the XLA fold (interpret mode, CPU
test suite).  On current Mosaic, compiled execution requires the window
column offsets to be 128-lane aligned; the reference geometry strides at
``sub = 0.75 * patch`` (e.g. 96), which is not, so the **XLA fold remains
the production backend** — its shift-add formulation vectorizes freely at
any stride and fuses with surrounding ops.  The kernel is kept as the
measured design alternative and for future geometries with aligned
strides (``patch = 2 * 2*margin`` multiples of 256).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:  # TPU-specific bits are unavailable when interpreting on CPU
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None
# pl.ANY is the modern spelling; pltpu.ANY (deprecated) only as fallback
_MEMSPACE_ANY = getattr(pl, "ANY", None)
if _MEMSPACE_ANY is None:  # pragma: no cover
    _MEMSPACE_ANY = pltpu.ANY

from unmicst_tpu.core.tiler import TileGrid


def _blend_kernel(
    tiles_ref, win_ref, init_ref, out_ref, acc_ref, sem_in, sem_out, *,
    npc: int, sub: int, patch: int
):
    # init_ref is the donated zero canvas (aliased with out_ref); all
    # access goes through out_ref.
    del init_ref
    t = pl.program_id(0)
    i = t // npc
    j = t % npc
    r0 = pl.multiple_of(i * sub, sub)
    c0 = pl.multiple_of(j * sub, sub)

    load = pltpu.make_async_copy(
        out_ref.at[pl.ds(r0, patch), pl.ds(c0, patch), :], acc_ref, sem_in
    )
    load.start()
    weighted = tiles_ref[0] * win_ref[...][..., None]
    load.wait()
    acc_ref[...] += weighted
    store = pltpu.make_async_copy(
        acc_ref, out_ref.at[pl.ds(r0, patch), pl.ds(c0, patch), :], sem_out
    )
    store.start()
    store.wait()


def blend_fold_pallas(
    tiles: jnp.ndarray,
    window: np.ndarray,
    grid: TileGrid,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """``[npr, npc, P, P, K] x [P, P] -> [H', W', K]`` overlap-add.

    Equivalent to ``tiler.fold(tiles * window[None, None, :, :, None])``.
    """
    npr, npc, patch, _, k = tiles.shape
    sub = grid.sub
    out_shape = (grid.padded_height, grid.padded_width, k)
    flat = tiles.reshape(npr * npc, patch, patch, k)
    zeros = jnp.zeros(out_shape, tiles.dtype)
    win = jnp.asarray(window, tiles.dtype)

    kernel = functools.partial(_blend_kernel, npc=npc, sub=sub, patch=patch)
    return pl.pallas_call(
        kernel,
        grid=(npr * npc,),
        in_specs=[
            pl.BlockSpec((1, patch, patch, k), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((patch, patch), lambda t: (0, 0)),
            pl.BlockSpec(memory_space=_MEMSPACE_ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=_MEMSPACE_ANY),
        out_shape=jax.ShapeDtypeStruct(out_shape, tiles.dtype),
        scratch_shapes=[
            pltpu.VMEM((patch, patch, k), tiles.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={2: 0},
        interpret=interpret,
    )(flat, win, zeros)
