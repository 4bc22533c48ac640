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

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (no-op single-host)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    ``data=None`` takes every device not claimed by ``model``.  Axis order
    puts ``model`` innermost so tensor-parallel collectives ride the
    fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-sharded NHWC activations."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh, tp_threshold: int = 256):
    """Sharding pytree for model params: tensor-parallel over output
    channels for kernels at least ``tp_threshold`` wide, replicated
    otherwise.

    With NHWC/HWIO convs, sharding the kernel's O dim makes XLA compute
    channel-sharded activations and all-gather only where a following op
    needs the full channel axis (GSPMD propagation) — the natural TP layout
    for the reference's widest (1280-channel) bottom layers.
    """
    tp = mesh.shape["model"]

    def spec_for(path_leaf):
        arr = path_leaf
        if arr.ndim == 4 and tp > 1 and arr.shape[-1] >= tp_threshold and arr.shape[-1] % tp == 0:
            return NamedSharding(mesh, P(None, None, None, "model"))
        if arr.ndim == 1 and tp > 1 and arr.shape[0] >= tp_threshold and arr.shape[0] % tp == 0:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, params)


def put_params(params, mesh: Mesh, tp_threshold: int = 256):
    shardings = shard_params(params, mesh, tp_threshold)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
