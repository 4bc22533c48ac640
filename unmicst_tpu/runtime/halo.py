"""Spatially-sharded inference with ICI halo exchange (the CP analogue).

The reference's "long-context" mechanism is overlap-tiling with margin halos
(SURVEY #2.6, #5): tiles + ``margin`` are its context windows, with zero
cross-tile dependence.  On a TPU pod the natural scale-out is therefore
*spatial sharding*: the slide canvas is row-sharded across the ``data`` mesh
axis, each device runs the tile pipeline on its band, and the two seams that
need neighbor data — the input halo (2*margin rows of the next band) and the
output overlap (the fold tail that lands on the next band's head) — travel
over ICI via ``jax.lax.ppermute``, exactly one hop each.

Everything is expressed with ``shard_map`` so the same code path runs on a
real pod or on the CPU-simulated 8-device mesh in CI.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh, PartitionSpec as P

try:  # public API since jax 0.8; experimental path removed later
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from unmicst_tpu.core import tiler, unet
from unmicst_tpu.core.hp import HParams
from unmicst_tpu.utils.batching import chunked_forward, round_up as _round_up


def spatial_infer(
    params,
    canvas: jnp.ndarray,
    height: int,
    width: int,
    hp: HParams,
    variant: str,
    mesh: Mesh,
    *,
    mean: float,
    std: float,
    axis: str = "data",
    tile_batch: int = 64,
    compute_dtype=None,
    precision=None,
    halo_impl: str = "ppermute",
    pallas_interpret: bool = False,
) -> jnp.ndarray:
    """Row-sharded tiled inference over ``mesh[axis]`` devices.

    ``canvas``: the zero-padded float32 canvas ``[npr_pad*sub + 2m, W', C]``
    (see :func:`build_canvas`).  Returns ``[H, W, K]`` probability maps
    (replicated).
    """
    n_dev = mesh.shape[axis]
    patch, margin = hp.im_size, hp.margin
    grid = tiler.make_grid(height, width, patch, margin)
    sub = grid.sub
    two_m = 2 * margin
    npr_pad = _round_up(grid.npr, n_dev)
    rows_per_dev = (npr_pad // n_dev) * sub
    R = npr_pad // n_dev  # tile rows per device
    band_grid = tiler.make_grid(R * sub, width, patch, margin)
    npc = grid.npc
    tiles_per_band = R * npc
    chunk = min(tile_batch, tiles_per_band)
    n_ch, n_cls = hp.n_channels, hp.n_classes
    window = tiler.ramp_window(patch, margin)

    expected_rows = npr_pad * sub + two_m
    if canvas.shape[0] != expected_rows:
        raise ValueError(
            f"canvas has {canvas.shape[0]} rows, expected {expected_rows}"
        )

    body = canvas[: npr_pad * sub]  # row-shardable part
    # The canvas tail (last 2m rows) can hold real image data whenever
    # H + margin > npr_pad*sub (e.g. H a multiple of sub); it is passed
    # replicated and becomes the LAST device's input halo.
    global_tail = canvas[npr_pad * sub :]

    def forward(t):
        return unet.apply(params, t, hp, variant,
                          compute_dtype=compute_dtype, precision=precision)

    if halo_impl in ("pallas", "pallas_overlap"):
        from unmicst_tpu.kernels.halo_rdma import ring_shift

        # ring_shift(x, axis, s) delivers device (i-s)'s block to device i,
        # matching ppermute's perm [(j, (j+s) % n)].  The input (-1) and
        # output (+1) hops are distinct collectives whose entry barriers
        # must not alias: with one collective_id a fast neighbor's
        # output-hop signal could release a slow device's input-hop wait
        # before the remote landing buffer exists (id 8 is the overlap
        # start kernel's, kept separate for the same reason).
        def exchange(buf, s):
            return ring_shift(buf, axis, s, collective_id=7 if s < 0 else 9,
                              interpret=pallas_interpret)
    elif halo_impl == "ppermute":
        def exchange(buf, s):
            return jax.lax.ppermute(
                buf, axis, [(j, (j + s) % n_dev) for j in range(n_dev)]
            )
    else:
        raise ValueError(f"unknown halo_impl {halo_impl!r}")

    # Overlap mode: only the LAST tile row of a band reads halo rows
    # (tile row r spans [r*sub, r*sub + patch); patch = sub + 2m), so the
    # decoupled RDMA pair brackets the interior forward — the hop rides
    # ICI underneath (R-1)*npc tiles of compute instead of blocking
    # before the first conv.  Degenerates to the synchronous path when
    # the band is a single tile row.
    overlap = halo_impl == "pallas_overlap" and R > 1
    if overlap:
        from unmicst_tpu.kernels.halo_rdma import (
            ring_shift_start, ring_shift_wait,
        )

        interior_grid = tiler.make_grid((R - 1) * sub, width, patch, margin)
        seam_grid = tiler.make_grid(sub, width, patch, margin)

    def band_fn(block, tail):
        # block: (rows_per_dev, W', C) — this device's band
        d = jax.lax.axis_index(axis)
        # --- input halo: first 2m rows of the next band; the last device
        # takes the global canvas tail instead (device i receives from
        # i+1, i.e. shift -1)
        head = block[:two_m]
        if overlap:
            handle = ring_shift_start(
                head, axis, -1, collective_id=8,
                interpret=pallas_interpret,
            )
            # interior tile rows 0..R-2: local rows only — no halo dep
            interior = (block[: (R - 1) * sub + two_m] - mean) / std
            int_tiles = tiler.unfold(interior, interior_grid).reshape(
                (R - 1) * npc, patch, patch, n_ch
            )
            int_probs = chunked_forward(forward, int_tiles, chunk)
            halo = ring_shift_wait(head, handle, axis)
            halo = jnp.where(d == n_dev - 1, tail, halo)
            # seam tile row R-1: last sub local rows + the 2m halo rows
            seam = jnp.concatenate([block[(R - 1) * sub :], halo], axis=0)
            seam = (seam - mean) / std
            seam_tiles = tiler.unfold(seam, seam_grid).reshape(
                npc, patch, patch, n_ch
            )
            seam_probs = chunked_forward(
                forward, seam_tiles, min(chunk, npc)
            )
            probs = jnp.concatenate([int_probs, seam_probs], axis=0)
        else:
            halo = exchange(head, -1)
            halo = jnp.where(d == n_dev - 1, tail, halo)
            stripe = jnp.concatenate([block, halo], axis=0)
            stripe = (stripe - mean) / std

            # --- local tile pipeline
            tiles = tiler.unfold(stripe, band_grid)
            flat = tiles.reshape(tiles_per_band, patch, patch, n_ch)
            # full chunks + one static remainder: zero forward padding
            probs = chunked_forward(forward, flat, chunk)
        probs = probs.reshape(R, npc, patch, patch, n_cls)
        row_ids = d * R + jnp.arange(R)
        mask = (row_ids < grid.npr).astype(jnp.float32)
        w = window[None, None, :, :, None] * mask[:, None, None, None, None]
        strip = tiler.fold(probs * w, band_grid)  # (rows_per_dev + 2m, W', K)

        # --- output halo: our fold tail lands on the next band's head
        tail = strip[rows_per_dev:]
        recv = exchange(tail, 1)
        recv = jnp.where(d == 0, jnp.zeros_like(recv), recv)
        out_block = strip[:rows_per_dev].at[:two_m].add(recv)
        return out_block, tail

    in_spec = P(axis, None, None)
    out_block, tails = shard_map(
        band_fn,
        mesh=mesh,
        in_specs=(in_spec, P()),
        out_specs=(in_spec, P(axis, None, None)),
        # the pallas interpret lowering mixes vma-tagged and literal values
        # inside the kernel (jax vma-check limitation); semantics are pinned
        # by the ppermute-equivalence tests
        check_vma=halo_impl == "ppermute",
    )(body, global_tail)

    # reassemble: sharded body + the genuine global tail (last device's)
    out = jnp.concatenate(
        [out_block, tails[-two_m:]], axis=0
    )  # (npr_pad*sub + 2m, W', K)
    count = tiler.count_map(grid, window)
    valid = out[: grid.padded_height] / count[..., None]
    m = margin
    return valid[m : m + height, m : m + width]


def build_canvas(
    image: np.ndarray,
    hp: HParams,
    n_dev: int,
    channel_mode: str = "broadcast",
) -> np.ndarray:
    """Host-side canvas assembly padded for an ``n_dev``-way row shard."""
    patch, margin = hp.im_size, hp.margin
    if image.ndim == 2:
        planes = [image] * (hp.n_channels if channel_mode == "broadcast" else 1)
    elif image.ndim == 3:
        if channel_mode == "broadcast":
            if image.shape[0] != 1:
                raise ValueError("broadcast mode expects a single plane")
            planes = [image[0]] * hp.n_channels
        else:
            planes = list(image)
    else:
        raise ValueError("image must be [H, W] or [C, H, W]")
    # same contract as InferenceEngine.make_canvas: a silent mismatch would
    # zero-fill (or overflow) channels and infer on mostly-blank input
    if len(planes) != hp.n_channels:
        raise ValueError(
            f"model expects {hp.n_channels} channels, got {len(planes)}"
        )
    height, width = planes[0].shape
    grid = tiler.make_grid(height, width, patch, margin)
    npr_pad = _round_up(grid.npr, n_dev)
    rows = npr_pad * grid.sub + 2 * margin
    canvas = np.zeros((rows, grid.padded_width, hp.n_channels), np.float32)
    for c, p in enumerate(planes):
        canvas[margin : margin + height, margin : margin + width, c] = p
    return canvas


# For repeated same-geometry calls, wrap spatial_infer in jax.jit at the
# call site with geometry baked into the closure (see
# tests/test_parallel.py::test_halo_under_jit).
