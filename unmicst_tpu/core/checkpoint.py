"""Checkpoint ingestion/serialization: TF1 name mapping + native format.

Maps TF1 tensor-bundle variables (read by :mod:`unmicst_tpu.core.tf1_ckpt`)
onto the :mod:`unmicst_tpu.core.unet` params pytree.  Variable-name schemas
verified against the shipped zoo checkpoints (SURVEY #2.5):

Legacy (``UnMicst.py``; e.g. ``models/nucleiDAPI``, 41 vars)::

    downsampling/ld{i}/kernel1 | kernelExtra{j} | shortcutWeights   (1x1)
    lb/kernel1
    upsampling/lu{i}/kernel1 | kernel2 | kernel2Extra{j}
    lt/kernel
    batch_normalization[_{i}]/{gamma,beta,moving_mean,moving_variance}
        (flat, creation order == down-layer order, UnMicst.py:99)

v2 (``UnMicst1-5.py`` et al.; e.g. ``models/nucleiDAPI1-5``, 137 vars)::

    downsampling/ld{i}/kernelD{i}
    ld{i}/shortcutWeights | kernelExtra{j} | batch_normalization/*
    lb/kernel1 ; conv/*                      (bottom BN, top-level scope)
    lu{i}/kernelU{i} | kernel2 | kernel2Extra{j} | conv2/*
    lt/kernel ; batch_normalization/*        (final BN, top-level scope)

Optimizer slot variables (``/Momentum``, ``/Adam``, ``/Adam_1``,
``optim/beta*_power``) and the global-step scalar are ignored for inference.

The native format is a flax msgpack blob carrying params + hp + variant +
normalization sidecars in one file.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from unmicst_tpu.core.hp import HParams, ModelBundle
from unmicst_tpu.core.tf1_ckpt import TF1Checkpoint
from unmicst_tpu.core.unet import Params, get_variant


def _bn_group(ck: TF1Checkpoint, scope: str) -> Dict[str, jnp.ndarray]:
    return {
        # host arrays: per-leaf device transfers through the tunnel pay a
        # round-trip each; the engine's first jit (or put_params) moves
        # the whole tree in one batched transfer
        "gamma": np.asarray(ck.get_tensor(f"{scope}/gamma")),
        "beta": np.asarray(ck.get_tensor(f"{scope}/beta")),
        "moving_mean": np.asarray(ck.get_tensor(f"{scope}/moving_mean")),
        "moving_variance": np.asarray(
            ck.get_tensor(f"{scope}/moving_variance")
        ),
    }


def load_tf1_params(prefix: str, hp: HParams, variant: str) -> Params:
    """Read a TF1 checkpoint into the unet params pytree (with validation)."""
    ck = TF1Checkpoint(prefix)
    legacy = get_variant(variant).legacy
    g = lambda name: np.asarray(ck.get_tensor(name))
    params: Params = {"down": [], "up": []}

    for i in range(hp.n_layers):
        if legacy:
            layer = {
                "kernel1": g(f"downsampling/ld{i}/kernel1"),
                "extra": [
                    g(f"downsampling/ld{i}/kernelExtra{j}")
                    for j in range(hp.n_extra_convs)
                ],
                "shortcut": g(f"downsampling/ld{i}/shortcutWeights"),
                "bn": _bn_group(
                    ck, "batch_normalization" + (f"_{i}" if i else "")
                ),
            }
        else:
            layer = {
                "kernel1": g(f"downsampling/ld{i}/kernelD{i}"),
                "extra": [
                    g(f"ld{i}/kernelExtra{j}") for j in range(hp.n_extra_convs)
                ],
                "shortcut": g(f"ld{i}/shortcutWeights"),
                "bn": _bn_group(ck, f"ld{i}/batch_normalization"),
            }
        params["down"].append(layer)

    params["bottom"] = {"kernel1": g("lb/kernel1")}
    if not legacy:
        params["bottom"]["bn"] = _bn_group(ck, "conv")

    for i in range(hp.n_layers):
        if legacy:
            layer = {
                "kernel1": g(f"upsampling/lu{i}/kernel1"),
                "kernel2": g(f"upsampling/lu{i}/kernel2"),
                "extra": [
                    g(f"upsampling/lu{i}/kernel2Extra{j}")
                    for j in range(hp.n_extra_convs)
                ],
            }
        else:
            layer = {
                "kernel1": g(f"lu{i}/kernelU{i}"),
                "kernel2": g(f"lu{i}/kernel2"),
                "extra": [
                    g(f"lu{i}/kernel2Extra{j}") for j in range(hp.n_extra_convs)
                ],
            }
            layer["bn"] = _bn_group(ck, f"lu{i}/conv2")
        params["up"].append(layer)

    params["top"] = {"kernel": g("lt/kernel")}
    if not legacy:
        params["top"]["bn"] = _bn_group(ck, "batch_normalization")

    _validate_shapes(params, hp)
    return params


def _validate_shapes(params: Params, hp: HParams) -> None:
    widths = hp.n_out_x
    ks = hp.ks
    for i, layer in enumerate(params["down"]):
        expect = (ks, ks, widths[i], widths[i + 1])
        got = tuple(layer["kernel1"].shape)
        if got != expect:
            raise ValueError(f"down[{i}].kernel1 shape {got} != {expect}")
    for i, layer in enumerate(params["down"]):
        for j, ke in enumerate(layer["extra"]):
            got = tuple(ke.shape)
            expect = (ks, ks, widths[i + 1], widths[i + 1])
            if got != expect:
                raise ValueError(
                    f"down[{i}].extra[{j}] shape {got} != {expect}"
                )
        for name in ("gamma", "beta", "moving_mean", "moving_variance"):
            if layer["bn"][name].shape != (widths[i + 1],):
                raise ValueError(
                    f"down[{i}].bn.{name} width "
                    f"{layer['bn'][name].shape} != ({widths[i + 1]},)"
                )
    for i, layer in enumerate(params["up"]):
        # transposed-conv kernel layout is [ks, ks, OUT, in]
        expect = (ks, ks, widths[i + 1], widths[i + 2])
        got = tuple(layer["kernel1"].shape)
        if got != expect:
            raise ValueError(f"up[{i}].kernel1 shape {got} != {expect}")
        expect = (ks, ks, widths[i] + widths[i + 1], widths[i + 1])
        got = tuple(layer["kernel2"].shape)
        if got != expect:
            raise ValueError(f"up[{i}].kernel2 shape {got} != {expect}")
    tk = tuple(params["top"]["kernel"].shape)
    if tk != (1, 1, widths[1], hp.n_classes):
        raise ValueError(
            f"top.kernel shape {tk} != (1, 1, {widths[1]}, {hp.n_classes})"
        )


def hp_from_tf1(
    prefix: str, variant: str, base: Optional[HParams] = None
) -> HParams:
    """Derive the architecture hyper-parameters from a checkpoint's shapes.

    Used when a model dir's ``hp.data`` disagrees with the only restorable
    bundle (e.g. ``mousenucleiDAPI``: sidecar says nOut0=20 but the shipped
    ``nuclei20x2bin1chan`` bundle is a 16-wide net).  ``im_size`` and
    ``batch_size`` are not recoverable from shapes and come from ``base``.
    """
    ck = TF1Checkpoint(prefix)
    legacy = get_variant(variant).legacy
    k1 = "downsampling/ld0/kernel1" if legacy else "downsampling/ld0/kernelD0"
    ks, _, n_channels, n_out0 = ck.get_shape(k1)
    n_layers = 0
    while ck.has_tensor(
        f"downsampling/ld{n_layers}/kernel1" if legacy
        else f"downsampling/ld{n_layers}/kernelD{n_layers}"
    ):
        n_layers += 1
    n_extra = 0
    extra_fmt = (
        "downsampling/ld0/kernelExtra{}" if legacy else "ld0/kernelExtra{}"
    )
    while ck.has_tensor(extra_fmt.format(n_extra)):
        n_extra += 1
    n_classes = ck.get_shape("lt/kernel")[-1]
    feat_fact = ck.get_shape("lb/kernel1")[-1] // ck.get_shape("lb/kernel1")[-2]
    base = base or HParams(
        im_size=128, n_channels=n_channels, n_classes=n_classes, n_out0=n_out0
    )
    return dataclasses.replace(
        base,
        n_channels=int(n_channels),
        n_classes=int(n_classes),
        n_out0=int(n_out0),
        ks=int(ks),
        n_layers=int(n_layers),
        n_extra_convs=int(n_extra),
        feat_maps_fact=int(feat_fact),
    )


def _find_ckpt_prefix(model_dir: str) -> Optional[str]:
    """Locate a restorable tensor bundle in a model dir.

    Prefers ``model.ckpt`` (the reference's fixed name, ``UnMicst.py:490``);
    falls back to any other ``<prefix>.index`` whose data shards are present
    (e.g. ``mousenucleiDAPI/nuclei20x2bin1chan`` — that dir's ``model.ckpt``
    data blob is absent upstream).
    """
    candidates = []
    for f in sorted(os.listdir(model_dir)):
        if f.endswith(".index"):
            candidates.append(os.path.join(model_dir, f[: -len(".index")]))
    candidates.sort(
        key=lambda p: os.path.basename(p) != "model.ckpt"
    )
    for prefix in candidates:
        base = os.path.basename(prefix)
        if any(
            f.startswith(base + ".data-") for f in os.listdir(model_dir)
        ):
            return prefix
    return None


def save_tf1_params(
    prefix: str, params: Params, hp: HParams, variant: str,
    global_step: int = 0,
) -> None:
    """Write params as a TF1 tensor bundle under the reference's variable
    names — the inverse of :func:`load_tf1_params`.  A model trained in
    this framework becomes restorable by the reference tool's
    ``Saver.restore`` (optimizer slots omitted; TF recreates them)."""
    from unmicst_tpu.core.tf1_ckpt import write_tf1_checkpoint

    legacy = get_variant(variant).legacy
    tensors: Dict[str, np.ndarray] = {}

    def put_bn(scope: str, bn: Dict) -> None:
        for k, ref in [
            ("gamma", "gamma"), ("beta", "beta"),
            ("moving_mean", "moving_mean"),
            ("moving_variance", "moving_variance"),
        ]:
            tensors[f"{scope}/{ref}"] = np.asarray(bn[k], np.float32)

    for i, layer in enumerate(params["down"]):
        if legacy:
            tensors[f"downsampling/ld{i}/kernel1"] = np.asarray(layer["kernel1"])
            for j, ke in enumerate(layer["extra"]):
                tensors[f"downsampling/ld{i}/kernelExtra{j}"] = np.asarray(ke)
            tensors[f"downsampling/ld{i}/shortcutWeights"] = np.asarray(
                layer["shortcut"]
            )
            put_bn("batch_normalization" + (f"_{i}" if i else ""), layer["bn"])
        else:
            tensors[f"downsampling/ld{i}/kernelD{i}"] = np.asarray(layer["kernel1"])
            for j, ke in enumerate(layer["extra"]):
                tensors[f"ld{i}/kernelExtra{j}"] = np.asarray(ke)
            tensors[f"ld{i}/shortcutWeights"] = np.asarray(layer["shortcut"])
            put_bn(f"ld{i}/batch_normalization", layer["bn"])

    tensors["lb/kernel1"] = np.asarray(params["bottom"]["kernel1"])
    if not legacy:
        put_bn("conv", params["bottom"]["bn"])

    for i, layer in enumerate(params["up"]):
        if legacy:
            tensors[f"upsampling/lu{i}/kernel1"] = np.asarray(layer["kernel1"])
            tensors[f"upsampling/lu{i}/kernel2"] = np.asarray(layer["kernel2"])
            for j, ke in enumerate(layer["extra"]):
                tensors[f"upsampling/lu{i}/kernel2Extra{j}"] = np.asarray(ke)
        else:
            tensors[f"lu{i}/kernelU{i}"] = np.asarray(layer["kernel1"])
            tensors[f"lu{i}/kernel2"] = np.asarray(layer["kernel2"])
            for j, ke in enumerate(layer["extra"]):
                tensors[f"lu{i}/kernel2Extra{j}"] = np.asarray(ke)
            put_bn(f"lu{i}/conv2", layer["bn"])

    tensors["lt/kernel"] = np.asarray(params["top"]["kernel"])
    if not legacy:
        put_bn("batch_normalization", params["top"]["bn"])

    # global step: a mid-training export must carry the schedule position
    # (the reference's exponential_decay reads it on restore)
    tensors["Variable"] = np.asarray(global_step, np.int32)
    tensors = {k: v.astype(np.float32) if v.dtype != np.int32 else v
               for k, v in tensors.items()}
    write_tf1_checkpoint(prefix, tensors)


# ---------------------------------------------------------------------------
# native format
# ---------------------------------------------------------------------------


def save_native(
    path: str,
    params: Params,
    hp: HParams,
    variant: str,
    mean: float,
    std: float,
    extra: Optional[dict] = None,
    extra_arrays: Optional[dict] = None,
) -> None:
    """Serialize params + metadata into one msgpack file.

    ``extra``: JSON-able scalars for the meta record.  ``extra_arrays``:
    an array-bearing pytree (e.g. optimizer state) serialized alongside
    the params; surfaced by :func:`load_native` as ``meta["_extra_arrays"]``.
    """
    from flax import serialization

    meta = {
        "hp": hp.to_ref_dict(),
        "variant": variant,
        "mean": mean,
        "std": std,
        "format": "unmicst-tpu-v1",
    }
    if extra:
        reserved = set(meta) & set(extra)
        if reserved:
            raise ValueError(
                f"extra clobbers reserved meta key(s) {sorted(reserved)}"
            )
        meta.update(extra)
    payload = {
        "meta_json": json.dumps(meta),
        "params": _to_numpy(params),
    }
    if extra_arrays is not None:
        payload["extra_arrays"] = _to_numpy(extra_arrays)
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_native(path: str) -> Tuple[Params, HParams, str, float, float, dict]:
    from flax import serialization

    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    meta = json.loads(tree["meta_json"])
    if "extra_arrays" in tree:
        meta["_extra_arrays"] = _listify(tree["extra_arrays"])
    hp = HParams.from_ref_dict(meta["hp"])
    params = _listify(tree["params"])
    return (
        params,
        hp,
        meta["variant"],
        float(meta["mean"]),
        float(meta["std"]),
        meta,
    )


def _to_numpy(tree):
    if isinstance(tree, dict):
        return {k: _to_numpy(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        # "__list_len" disambiguates [] from {} (both would otherwise
        # serialize to an empty dict and come back as the wrong type —
        # e.g. optax EmptyState in the persisted optimizer tree)
        out = {f"__list_{i}": _to_numpy(v) for i, v in enumerate(tree)}
        out["__list_len"] = np.int64(len(tree))
        return out
    return np.asarray(tree)


def _listify(tree):
    if isinstance(tree, dict):
        if "__list_len" in tree:
            return [
                _listify(tree[f"__list_{i}"])
                for i in range(int(tree["__list_len"]))
            ]
        if tree and all(k.startswith("__list_") for k in tree):
            # pre-r3 files without the length marker
            return [
                _listify(tree[f"__list_{i}"]) for i in range(len(tree))
            ]
        if not tree:
            # pre-r3 files: an empty container in the params tree is
            # always the extras LIST; new files carry __list_len
            return []
        return {k: _listify(v) for k, v in tree.items()}
    return np.asarray(tree)


def save_orbax(path: str, params: Params, meta: Optional[dict] = None) -> None:
    """Orbax checkpoint (the standard TPU-job format; sharding-aware,
    async-capable) — alternative backend to the msgpack native format."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {"params": params}, force=True)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta or {}, f)


def load_orbax(path: str) -> Tuple[Params, dict]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    meta = {}
    try:
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    except OSError:
        pass
    return tree["params"], meta


def load_params_for_bundle(bundle: ModelBundle) -> Params:
    """Load params for a model dir: native file if present, else TF1 bundle."""
    if bundle.has_native_ckpt:
        params, hp, variant, _, _, _ = load_native(bundle.native_ckpt_path)
        if variant != bundle.variant:
            # silently running the other generation's graph on these
            # params would produce wrong maps (or a deep KeyError)
            raise ValueError(
                f"native checkpoint is variant {variant!r} but the model "
                f"dir resolves to {bundle.variant!r}"
            )
        arch = ("n_channels", "n_classes", "n_out0", "feat_maps_fact",
                "down_samp_fact", "ks", "n_extra_convs", "n_layers")
        mismatched = [
            f for f in arch if getattr(hp, f) != getattr(bundle.hp, f)
        ]
        if mismatched:
            raise ValueError(
                f"native checkpoint hp mismatch with hp.data on "
                f"architecture field(s) {mismatched}"
            )
        # non-architecture fields (im_size, batch_size, std_dev0) do not
        # shape the params; the sidecar/bundle values win
        return params
    prefix = _find_ckpt_prefix(bundle.model_dir)
    if prefix is None:
        raise FileNotFoundError(
            f"no restorable checkpoint in {bundle.model_dir} (the upstream "
            "repo fetches large blobs from S3 at Docker build, Dockerfile:4-5)"
        )
    hp = bundle.hp
    if os.path.basename(prefix) != "model.ckpt":
        # alternate bundle: trust its shapes over the (possibly stale)
        # hp.data sidecar — e.g. mousenucleiDAPI's nuclei20x2bin1chan
        derived = hp_from_tf1(prefix, bundle.variant, base=hp)
        if derived != hp:
            bundle.hp = hp = derived
    return load_tf1_params(prefix, hp, bundle.variant)
