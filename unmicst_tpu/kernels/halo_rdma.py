"""Pallas RDMA ring halo-exchange — the kernel alternative to ``ppermute``.

The spatial-sharding runtime (:mod:`unmicst_tpu.runtime.halo`) moves two
seam buffers per band over ICI: the input halo (next band's first ``2m``
rows) and the output fold tail.  The XLA path expresses both as
``jax.lax.ppermute``; this module provides the same single-hop shift as an
explicit Pallas kernel using ``make_async_remote_copy`` — giving the
runtime control over buffering and priority, and serving as the in-repo
exemplar of the guide's ring-collective pattern (pallas_guide.md, "Async
Remote DMA" / "Ring Collectives").

Semantics: ``ring_shift(x, axis, shift)`` inside ``shard_map`` returns, on
device ``i``, the block that device ``(i - shift) mod n`` contributed —
identical to ``jax.lax.ppermute(x, axis, [(j, (j + shift) % n) for j in
range(n)])``.

Mesh constraint: Mosaic's LOGICAL device-id lowering supports a single
named mesh axis — run the kernel under a 1-axis mesh (slice the ring axis
out of a larger mesh, as ``__graft_entry__.dryrun_multichip`` does).

Measurement status (2026-08): this host exposes ONE physical TPU chip, so
the ICI path cannot be timed here; correctness is pinned against ppermute
on the CPU-simulated mesh (interpret mode) by ``tests/test_kernels.py``,
and the single-device ring degenerates to a self-copy that runs compiled
on the real chip.  On a real slice the kernel rides the same ICI links as
the XLA collective; the win to look for is overlapping the halo push with
the band forward pass (``rdma.start()`` early, ``wait()`` late), which the
ppermute formulation cannot express.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# pl.ANY is the modern memory-space spelling; pltpu.ANY (deprecated
# alias) kept as a fallback for older jax
_ANY = getattr(pl, "ANY", None)
if _ANY is None:  # pragma: no cover
    _ANY = pltpu.ANY


def _shift_kernel(x_ref, out_ref, send_sem, recv_sem, *, axis: str,
                  shift: int, collective: bool):
    my = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)
    dst = jax.lax.rem(my + shift + n, n)
    src = jax.lax.rem(my - shift + n, n)

    if collective:
        # I may not write dst's out_ref until dst has entered the kernel.
        # Each device signals its SOURCE-side neighbor ("my buffers are
        # ready, you may write me"); the one signal I then wait for can
        # only have come from my dst (the device whose source I am), which
        # proves dst has entered.
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=src,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        pltpu.semaphore_wait(barrier, 1)

    rdma = pltpu.make_async_remote_copy(
        src_ref=x_ref,
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=dst,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma.start()
    rdma.wait()


def ring_shift(
    x: jnp.ndarray,
    axis: str,
    shift: int = 1,
    *,
    collective_id: int = 7,
    interpret: bool = False,
) -> jnp.ndarray:
    """One-hop ring shift of ``x`` along mesh axis ``axis`` (shard_map only).

    ``shift=+1`` sends to the next device (recv from previous);
    ``shift=-1`` the reverse.  Drop-in for the halo runtime's two
    ``ppermute`` calls.
    """
    kernel = partial(
        _shift_kernel, axis=axis, shift=shift,
        collective=not interpret,  # barrier sem needs a real collective_id
    )
    # under shard_map with vma checking, the output varies over the same
    # mesh axes as the input block
    vma = getattr(jax.typeof(x), "vma", None)
    out_shape = (
        jax.ShapeDtypeStruct(x.shape, x.dtype, vma=vma)
        if vma is not None else jax.ShapeDtypeStruct(x.shape, x.dtype)
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=_ANY)],
        out_specs=pl.BlockSpec(memory_space=_ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id,
        ),
        interpret=interpret,
    )(x)


# ---------------------------------------------------------------------------
# Decoupled start/wait — overlap the hop with compute between the two calls
# ---------------------------------------------------------------------------
#
# ``ring_shift`` starts and waits inside one kernel, so XLA schedules it as
# one synchronous custom call.  The decoupled pair below splits the DMA
# across two kernels: ``ring_shift_start`` enqueues the remote copy and
# returns its landing buffer plus both DMA semaphores AS KERNEL OUTPUTS
# (pallas semaphore outputs, pallas_guide.md "Semaphores in out_shape");
# ``ring_shift_wait`` blocks on them.  Any compute issued between the two
# calls has no data dependence on the hop, so it runs while the bytes are
# on the wire — the overlap ``docs/PALLAS.md`` names as the one thing the
# ppermute formulation cannot express.
#
# Mosaic interpret mode cannot materialize semaphore values, so under
# ``interpret=True`` the pair degenerates to a synchronous ``ring_shift``
# at start (wait returns the stored result): the *pipeline* built on the
# decoupled API is correctness-pinned on the CPU mesh, while the compiled
# semaphore path is exercised by the 1-chip self-ring on real TPU
# (``scripts/halo_overlap_tpu.py``).


class RingShiftHandle(NamedTuple):
    """In-flight one-hop shift: landing buffer + DMA semaphores."""

    buf: jnp.ndarray
    send_sem: Optional[object]
    recv_sem: Optional[object]
    shift: int
    interpret: bool


def _start_kernel(x_ref, out_ref, send_sem, recv_sem, *, axis: str,
                  shift: int, collective: bool):
    my = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)
    dst = jax.lax.rem(my + shift + n, n)
    src = jax.lax.rem(my - shift + n, n)
    if collective:
        # same entry handshake as _shift_kernel: nobody writes a remote
        # buffer before its owner has entered (and thus allocated) it
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=src,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        pltpu.semaphore_wait(barrier, 1)
    pltpu.make_async_remote_copy(
        src_ref=x_ref, dst_ref=out_ref,
        send_sem=send_sem, recv_sem=recv_sem,
        device_id=dst, device_id_type=pltpu.DeviceIdType.LOGICAL,
    ).start()


def _wait_kernel(x_ref, buf_ref, send_sem, recv_sem, out_ref, *, axis: str,
                 shift: int):
    # rebuild the descriptor over the same refs/semaphores; wait() blocks
    # until both the local send and the remote-write receive complete.
    # out_ref aliases buf_ref (input_output_aliases), so no copy.
    del out_ref
    my = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)
    dst = jax.lax.rem(my + shift + n, n)
    pltpu.make_async_remote_copy(
        src_ref=x_ref, dst_ref=buf_ref,
        send_sem=send_sem, recv_sem=recv_sem,
        device_id=dst, device_id_type=pltpu.DeviceIdType.LOGICAL,
    ).wait()


def _out_struct(x: jnp.ndarray):
    vma = getattr(jax.typeof(x), "vma", None)
    if vma is not None:
        return jax.ShapeDtypeStruct(x.shape, x.dtype, vma=vma)
    return jax.ShapeDtypeStruct(x.shape, x.dtype)


def ring_shift_start(
    x: jnp.ndarray,
    axis: str,
    shift: int = 1,
    *,
    collective_id: int = 7,
    interpret: bool = False,
) -> RingShiftHandle:
    """Enqueue the one-hop shift of ``x`` along ``axis``; returns a handle.

    Issue independent compute after this call, then redeem the handle with
    :func:`ring_shift_wait` — the hop rides ICI underneath that compute.
    """
    if interpret:
        done = ring_shift(x, axis, shift, collective_id=collective_id,
                          interpret=True)
        return RingShiftHandle(done, None, None, shift, True)
    buf, send_sem, recv_sem = pl.pallas_call(
        partial(_start_kernel, axis=axis, shift=shift, collective=True),
        out_shape=(
            _out_struct(x),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ),
        in_specs=[pl.BlockSpec(memory_space=_ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=_ANY),
            pl.BlockSpec(memory_space=pltpu.SEMAPHORE),
            pl.BlockSpec(memory_space=pltpu.SEMAPHORE),
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id,
        ),
        interpret=False,
    )(x)
    return RingShiftHandle(buf, send_sem, recv_sem, shift, False)


def ring_shift_wait(
    x: jnp.ndarray,
    handle: RingShiftHandle,
    axis: str,
) -> jnp.ndarray:
    """Block until the hop started from ``x`` completes; returns the block
    contributed by device ``(i - shift) mod n`` (ppermute semantics)."""
    if handle.interpret:
        return handle.buf
    return pl.pallas_call(
        partial(_wait_kernel, axis=axis, shift=handle.shift),
        out_shape=_out_struct(handle.buf),
        in_specs=[
            pl.BlockSpec(memory_space=_ANY),
            pl.BlockSpec(memory_space=_ANY),
            pl.BlockSpec(memory_space=pltpu.SEMAPHORE),
            pl.BlockSpec(memory_space=pltpu.SEMAPHORE),
        ],
        out_specs=pl.BlockSpec(memory_space=_ANY),
        input_output_aliases={1: 0},  # out aliases the landing buffer
        # no collective_id: the wait side holds no barrier semaphore
        # (Mosaic rejects the combination); ordering comes from the DMA
        # semaphores handed over from the start kernel
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=False,
    )(x, handle.buf, handle.send_sem, handle.recv_sem)
