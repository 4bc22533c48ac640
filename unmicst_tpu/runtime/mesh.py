"""Device mesh + sharding policy — the framework's parallel runtime.

The reference is strictly single-device (``CUDA_VISIBLE_DEVICES`` pinning,
``UnMicst.py:577-595``; no collective backend anywhere — SURVEY #2.6).  The
TPU rebuild makes parallelism first-class:

* ``data`` mesh axis — tile-/batch-level data parallelism (the tile stream
  of one slide, or the sample batch in training, sharded across chips; XLA
  inserts the gradient ``psum`` over ICI),
* ``model`` mesh axis — tensor parallelism over conv channels for the
  widest layers (the 1280-wide v2 bottom, SURVEY #2.6 "TP" row),
* spatial sharding (the sequence-parallel analogue) lives in
  :mod:`unmicst_tpu.runtime.halo`.

Multi-host: ``initialize_distributed`` wraps ``jax.distributed.initialize``
so the same mesh spans pods (DCN between hosts, ICI within).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up.

    With explicit counts this is a plain ``jax.distributed.initialize``
    call.  With NO arguments it still calls initialize and lets JAX
    auto-detect the job geometry from the environment (TPU pods, SLURM,
    ...) — silently skipping here would leave each host running an
    isolated, desynchronized copy of the job.  ``num_processes == 1``
    explicitly requests single-process mode and is the only no-op.
    """
    if num_processes == 1:
        return
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    ``data=None`` takes every device not claimed by ``model``.  Axis order
    puts ``model`` innermost; with no explicit device list the device grid
    comes from ``mesh_utils.create_device_mesh`` (topology-aware
    placement, so tensor-parallel collectives actually ride the fastest
    ICI links — a naive enumeration-order reshape does not guarantee
    that on real slices).
    """
    if model < 1:
        raise ValueError(f"model axis must be >= 1, got {model}")
    n = len(devices) if devices is not None else len(jax.devices())
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data < 1:
        raise ValueError(f"data axis must be >= 1, got {data}")
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    if devices is None and data * model == n:
        try:
            # topology-aware device ORDER (mesh semantics unchanged —
            # jax.make_mesh would switch the axes to explicit-sharding
            # mode and break the shard_map call sites)
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_device_mesh((data, model))
            return Mesh(grid, ("data", "model"))
        except Exception:
            pass
    devices = list(devices if devices is not None else jax.devices())
    grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-sharded NHWC activations."""
    return NamedSharding(mesh, P("data"))


def shard_params(params, mesh: Mesh, tp_threshold: int = 256):
    """Sharding pytree for model params: tensor-parallel over OUTPUT
    channels for kernels at least ``tp_threshold`` wide, replicated
    otherwise.

    With NHWC/HWIO convs, sharding the kernel's O dim makes XLA compute
    channel-sharded activations and all-gather only where a following op
    needs the full channel axis (GSPMD propagation) — the natural TP layout
    for the reference's widest (1280-channel) bottom layers.  The up-path
    transposed-conv kernels are laid out ``[ks, ks, OUT, in]``
    (``core/unet.py::conv_transpose``, ``transpose_kernel=True``), so for
    those the O dim is axis -2, not -1 — sharding -1 there would
    partition the contraction and force an all-reduce per decoder layer.
    """
    tp = mesh.shape["model"]

    def spec_for(path, arr):
        # up-layer "kernel1" entries are the transpose kernels: O at -2
        is_transpose = (
            len(path) >= 3
            and getattr(path[0], "key", None) == "up"
            and getattr(path[-1], "key", None) == "kernel1"
        )
        o_axis = -2 if is_transpose else -1
        if (arr.ndim == 4 and tp > 1
                and arr.shape[o_axis] >= tp_threshold
                and arr.shape[o_axis] % tp == 0):
            spec = [None, None, None, None]
            spec[o_axis] = "model"
            return NamedSharding(mesh, P(*spec))
        if (arr.ndim == 1 and tp > 1 and arr.shape[0] >= tp_threshold
                and arr.shape[0] % tp == 0):
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def put_params(params, mesh: Mesh, tp_threshold: int = 256):
    shardings = shard_params(params, mesh, tp_threshold)
    # one pytree-level device_put: JAX batches the transfers (per-leaf
    # dispatch pays the link round-trip once per leaf)
    return jax.device_put(params, shardings)
