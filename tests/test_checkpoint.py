"""TF1 bundle reader + name mapping + native checkpoint round trip."""

import os

import jax
import numpy as np
import pytest

from tests.conftest import REFERENCE, needs_reference
from unmicst_tpu.core import unet
from unmicst_tpu.core.checkpoint import (
    _find_ckpt_prefix,
    load_native,
    load_params_for_bundle,
    load_tf1_params,
    save_native,
)
from unmicst_tpu.core.hp import HParams, load_model_dir
from unmicst_tpu.core.tf1_ckpt import TF1Checkpoint


@needs_reference
def test_read_legacy_bundle():
    ck = TF1Checkpoint(os.path.join(REFERENCE, "models/nucleiDAPI/model.ckpt"))
    keys = ck.keys()
    assert len(keys) == 41  # SURVEY #2.5
    assert ck.get_shape("downsampling/ld0/kernel1") == (5, 5, 1, 16)
    assert ck.get_shape("upsampling/lu0/kernel2") == (5, 5, 17, 16)
    t = ck.get_tensor("lt/kernel")
    assert t.shape == (1, 1, 16, 3) and t.dtype == np.float32
    assert np.isfinite(t).all() and t.std() > 0


@needs_reference
def test_v2_index_schema():
    """The v2 dirs ship index files (data blobs live on S3 upstream)."""
    ck = TF1Checkpoint(os.path.join(REFERENCE, "models/nucleiDAPI1-5/model.ckpt"))
    assert ck.has_tensor("downsampling/ld0/kernelD0")
    assert ck.has_tensor("ld0/shortcutWeights")
    assert ck.has_tensor("conv/moving_variance")  # bottom BN, top-level scope
    assert ck.has_tensor("lu3/conv2/gamma")
    assert ck.get_shape("lb/kernel1") == (3, 3, 640, 1280)
    assert ck.get_shape("batch_normalization/gamma") == (3,)  # final BN


@needs_reference
def test_legacy_mapping_loads_and_runs():
    bundle = load_model_dir(os.path.join(REFERENCE, "models/nucleiDAPI"))
    assert bundle.variant == "legacy"
    params = load_params_for_bundle(bundle)
    x = np.random.RandomState(0).randn(2, 128, 128, 1).astype(np.float32)
    y = unet.apply(params, x, bundle.hp, bundle.variant)
    assert y.shape == (2, 128, 128, 3)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-5)


@needs_reference
def test_mousenuclei_fallback_prefix():
    """mousenucleiDAPI's model.ckpt data blob is absent upstream; the
    alternate bundle ``nuclei20x2bin1chan`` is discovered instead."""
    d = os.path.join(REFERENCE, "models/mousenucleiDAPI")
    prefix = _find_ckpt_prefix(d)
    assert prefix is not None and prefix.endswith("nuclei20x2bin1chan")


@needs_reference
def test_missing_blob_raises():
    bundle = load_model_dir(os.path.join(REFERENCE, "models/nucleiDAPI1-5"))
    assert bundle.variant == "v2"
    with pytest.raises(FileNotFoundError):
        load_params_for_bundle(bundle)


def test_native_roundtrip(tmp_path):
    hp = HParams(im_size=32, n_channels=1, n_classes=3, n_out0=4, ks=3, n_layers=2)
    params = unet.init_params(jax.random.PRNGKey(0), hp, "v2")
    path = str(tmp_path / "m.msgpack")
    save_native(path, params, hp, "v2", 0.25, 0.15)
    p2, hp2, variant, mean, std, meta = load_native(path)
    assert hp2 == hp and variant == "v2" and mean == 0.25 and std == 0.15
    flat1, _ = jax.tree_util.tree_flatten(params)
    flat2, _ = jax.tree_util.tree_flatten(p2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # structure preserved (lists stay lists)
    assert isinstance(p2["down"], list) and isinstance(p2["down"][0]["extra"], list)


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from unmicst_tpu.core.checkpoint import load_orbax, save_orbax

    hp = HParams(im_size=32, n_channels=1, n_classes=3, n_out0=4, ks=3, n_layers=1)
    params = unet.init_params(jax.random.PRNGKey(0), hp, "v2")
    path = str(tmp_path / "ckpt")
    save_orbax(path, params, {"step": 7})
    p2, meta = load_orbax(path)
    assert meta == {"step": 7}
    for a, b in zip(
        jax.tree_util.tree_flatten(params)[0], jax.tree_util.tree_flatten(p2)[0]
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@needs_reference
def test_sidecar_loading():
    bundle = load_model_dir(os.path.join(REFERENCE, "models/nucleiDAPI"))
    assert abs(bundle.mean - 0.19808180266398068) < 1e-12
    assert abs(bundle.std - 0.16236284911018245) < 1e-12
    assert bundle.hp.im_size == 128 and bundle.hp.n_layers == 2
    # CLI override path (mean/std != -1 bypass sidecars, UnMicst.py:494-502)
    b2 = load_model_dir(os.path.join(REFERENCE, "models/nucleiDAPI"), mean=0.5, std=0.2)
    assert b2.mean == 0.5 and b2.std == 0.2


def test_tf1_reader_truncation_and_corruption_fuzz(tmp_path):
    """Truncated/corrupted TF1 bundles must fail with clean exceptions
    (never hang, crash, or allocate unboundedly); random byte flips that
    land in tensor data are caught by the crc32c verification."""
    import jax

    from unmicst_tpu.core import unet
    from unmicst_tpu.core.checkpoint import load_tf1_params, save_tf1_params
    from unmicst_tpu.core.hp import HParams

    hp = HParams(im_size=32, n_channels=1, n_classes=3, n_out0=4, ks=3,
                 n_extra_convs=0, n_layers=2, batch_size=2)
    params = unet.init_params(jax.random.PRNGKey(0), hp, "legacy")
    prefix = str(tmp_path / "m.ckpt")
    import numpy as _np

    host = jax.tree_util.tree_map(_np.asarray, params)
    save_tf1_params(prefix, host, hp, "legacy")

    frng = np.random.RandomState(99)
    for suffix in (".index", ".data-00000-of-00001"):
        blob = open(prefix + suffix, "rb").read()
        for cut in sorted(set([0, 1] + list(frng.randint(2, len(blob), 8)))):
            with open(prefix + suffix, "wb") as f:
                f.write(blob[:cut])
            try:
                load_tf1_params(prefix, hp, "legacy")
            except Exception as e:  # noqa: BLE001 — clean failure contract
                assert not isinstance(e, (MemoryError, SystemError)), e
        for _ in range(8):
            corrupted = bytearray(blob)
            for pos in frng.randint(0, len(blob), 4):
                corrupted[pos] ^= 0xFF
            with open(prefix + suffix, "wb") as f:
                f.write(bytes(corrupted))
            try:
                load_tf1_params(prefix, hp, "legacy")
            except Exception as e:  # noqa: BLE001
                assert not isinstance(e, (MemoryError, SystemError)), e
        with open(prefix + suffix, "wb") as f:
            f.write(blob)  # restore for the next suffix round
