"""TF1 tensor-bundle writer: round trips + schema identity with real ckpts."""

import os

import jax
import numpy as np
import pytest

from tests.conftest import REFERENCE, needs_reference
from unmicst_tpu.core import unet
from unmicst_tpu.core.checkpoint import load_tf1_params, save_tf1_params
from unmicst_tpu.core.hp import HParams
from unmicst_tpu.core.tf1_ckpt import TF1Checkpoint, write_tf1_checkpoint


@pytest.mark.parametrize("variant", ["legacy", "v2"])
def test_params_roundtrip(tmp_path, variant):
    hp = HParams(
        im_size=32, n_channels=1, n_classes=3, n_out0=4, ks=3,
        n_extra_convs=1 if variant == "legacy" else 0, n_layers=2,
    )
    params = unet.init_params(jax.random.PRNGKey(0), hp, variant)
    prefix = str(tmp_path / "model.ckpt")
    save_tf1_params(prefix, params, hp, variant)
    p2 = load_tf1_params(prefix, hp, variant)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )


def test_raw_tensor_roundtrip(tmp_path, rng):
    tensors = {
        "a/b": rng.rand(3, 5).astype(np.float32),
        "a/c": rng.rand(7).astype(np.float64),
        "scalar": np.int32(4) * np.ones((), np.int32),
        "big": rng.rand(64, 64, 8).astype(np.float32),
    }
    prefix = str(tmp_path / "m.ckpt")
    write_tf1_checkpoint(prefix, tensors)
    ck = TF1Checkpoint(prefix)
    assert ck.keys() == sorted(tensors)
    for k, v in tensors.items():
        got = ck.get_tensor(k)
        assert got.dtype == v.dtype
        np.testing.assert_array_equal(got, v)


@needs_reference
def test_schema_matches_tf_written_checkpoint(tmp_path):
    """Rewriting the shipped legacy checkpoint reproduces its non-slot
    variable set with bit-identical tensors."""
    real_prefix = os.path.join(REFERENCE, "models/nucleiDAPI/model.ckpt")
    hp = HParams(
        im_size=128, n_channels=1, n_classes=3, n_out0=16, ks=5,
        n_extra_convs=1, n_layers=2, batch_size=16,
    )
    params = load_tf1_params(real_prefix, hp, "legacy")
    prefix = str(tmp_path / "model.ckpt")
    save_tf1_params(prefix, params, hp, "legacy")
    real = TF1Checkpoint(real_prefix)
    ours = TF1Checkpoint(prefix)
    non_slot = sorted(k for k in real.keys() if "Momentum" not in k)
    assert ours.keys() == non_slot
    for k in ours.keys():
        if k == "Variable":
            continue
        np.testing.assert_array_equal(ours.get_tensor(k), real.get_tensor(k))


def test_bfloat16_roundtrip(tmp_path, rng):
    # regression: DT_BFLOAT16 (dtype 14) used to come back as raw uint16
    # bit patterns on stock numpy; ml_dtypes decodes it properly
    import ml_dtypes

    t = rng.rand(4, 6).astype(ml_dtypes.bfloat16)
    prefix = str(tmp_path / "bf.ckpt")
    write_tf1_checkpoint(prefix, {"w": t})
    got = TF1Checkpoint(prefix).get_tensor("w")
    assert got.dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(
        got.astype(np.float32), t.astype(np.float32)
    )


def test_num_shards_read_from_header(tmp_path, rng, monkeypatch):
    # regression: num_shards was inferred as 1 + max(shard_id), which names
    # the data files wrong when the trailing shard holds no tensors
    # (possible with device-sharded Saver output)
    from unmicst_tpu.core import tf1_ckpt

    real = tf1_ckpt._encode_header_proto
    monkeypatch.setattr(
        tf1_ckpt, "_encode_header_proto", lambda: real(num_shards=2)
    )
    tensors = {"a": rng.rand(3).astype(np.float32)}
    prefix = str(tmp_path / "s.ckpt")
    write_tf1_checkpoint(prefix, tensors)
    os.rename(
        prefix + ".data-00000-of-00001", prefix + ".data-00000-of-00002"
    )
    open(prefix + ".data-00001-of-00002", "wb").close()  # empty trailing shard
    ck = TF1Checkpoint(prefix)
    np.testing.assert_array_equal(ck.get_tensor("a"), tensors["a"])
