"""UNet primitives vs torch oracles + architecture construction checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from unmicst_tpu.core import unet
from unmicst_tpu.core.hp import HParams


def test_conv_same_matches_torch(rng):
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    k = rng.randn(5, 5, 3, 7).astype(np.float32)
    ours = np.asarray(unet.conv(jnp.array(x), jnp.array(k)))
    theirs = (
        torch.nn.functional.conv2d(
            torch.tensor(x).permute(0, 3, 1, 2),
            torch.tensor(k).permute(3, 2, 0, 1),
            padding="same",
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


@pytest.mark.parametrize("ks", [3, 5])
def test_conv_transpose_matches_tf_semantics(rng, ks):
    """tf.nn.conv2d_transpose SAME, stride 2, kernel [h,w,out,in]
    (``UnMicst.py:153-155``): full torch conv_transpose cropped by the SAME
    pad offset is the TF result."""
    size, stride = 8, 2
    x = rng.randn(2, size, size, 6).astype(np.float32)
    k = rng.randn(ks, ks, 4, 6).astype(np.float32)
    ours = np.asarray(unet.conv_transpose(jnp.array(x), jnp.array(k), stride))
    pad_before = max(ks - stride, 0) // 2
    full = torch.nn.functional.conv_transpose2d(
        torch.tensor(x).permute(0, 3, 1, 2),
        torch.tensor(k).permute(3, 2, 0, 1),
        stride=stride,
    )
    out = size * stride
    theirs = (
        full[:, :, pad_before : pad_before + out, pad_before : pad_before + out]
        .permute(0, 2, 3, 1)
        .numpy()
    )
    assert ours.shape == theirs.shape == (2, out, out, 4)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_bn_eval_matches_torch(rng):
    x = rng.randn(2, 8, 8, 5).astype(np.float32)
    bn = {
        "gamma": jnp.array(rng.rand(5).astype(np.float32)),
        "beta": jnp.array(rng.rand(5).astype(np.float32)),
        "moving_mean": jnp.array(rng.randn(5).astype(np.float32)),
        "moving_variance": jnp.array(rng.rand(5).astype(np.float32) + 0.5),
    }
    ours = np.asarray(unet.bn_apply(jnp.array(x), bn))
    theirs = (
        torch.nn.functional.batch_norm(
            torch.tensor(x).permute(0, 3, 1, 2),
            torch.tensor(np.asarray(bn["moving_mean"])),
            torch.tensor(np.asarray(bn["moving_variance"])),
            torch.tensor(np.asarray(bn["gamma"])),
            torch.tensor(np.asarray(bn["beta"])),
            training=False,
            eps=unet.BN_EPS,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_bn_train_updates_moving_stats(rng):
    x = jnp.array(rng.randn(4, 8, 8, 3).astype(np.float32) * 2 + 1)
    bn = {
        "gamma": jnp.ones((3,)),
        "beta": jnp.zeros((3,)),
        "moving_mean": jnp.zeros((3,)),
        "moving_variance": jnp.ones((3,)),
    }
    y, new_bn = unet.bn_train(x, bn)
    np.testing.assert_allclose(np.asarray(jnp.mean(y, (0, 1, 2))), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.std(y, (0, 1, 2))), 1, atol=1e-2)
    expect_mean = 0.01 * np.asarray(jnp.mean(x, (0, 1, 2)))
    np.testing.assert_allclose(np.asarray(new_bn["moving_mean"]), expect_mean, atol=1e-5)


@pytest.mark.parametrize("variant", ["legacy", "v2", "duo", "cyto2"])
def test_forward_shapes_and_softmax(variant):
    hp = HParams(
        im_size=64, n_channels=2 if variant == "duo" else 1, n_classes=3,
        n_out0=8, ks=3, n_extra_convs=1, n_layers=2, batch_size=4,
    )
    params = unet.init_params(jax.random.PRNGKey(0), hp, variant)
    x = jnp.ones((2, 64, 64, hp.n_channels))
    y = unet.apply(params, x, hp, variant)
    assert y.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-5)


def test_train_mode_returns_updated_bn():
    hp = HParams(im_size=32, n_channels=1, n_classes=2, n_out0=4, ks=3, n_layers=1)
    params = unet.init_params(jax.random.PRNGKey(0), hp, "v2")
    x = jnp.array(np.random.RandomState(0).randn(4, 32, 32, 1).astype(np.float32))
    y, new_params = unet.apply(
        params, x, hp, "v2", train=True, rng=jax.random.PRNGKey(1)
    )
    assert y.shape == (4, 32, 32, 2)
    before = np.asarray(params["down"][0]["bn"]["moving_mean"])
    after = np.asarray(new_params["down"][0]["bn"]["moving_mean"])
    assert not np.allclose(before, after)
    # kernels untouched
    np.testing.assert_array_equal(
        np.asarray(params["down"][0]["kernel1"]),
        np.asarray(new_params["down"][0]["kernel1"]),
    )


def test_legacy_vs_v2_structural_deltas():
    hp = HParams(im_size=32, n_channels=1, n_classes=3, n_out0=4, ks=3, n_layers=2)
    legacy = unet.init_params(jax.random.PRNGKey(0), hp, "legacy")
    v2 = unet.init_params(jax.random.PRNGKey(0), hp, "v2")
    # legacy shortcut is 1x1 (UnMicst.py:95-97); v2 is ks x ks (UnMicst1-5.py:106-112)
    assert legacy["down"][0]["shortcut"].shape[:2] == (1, 1)
    assert v2["down"][0]["shortcut"].shape[:2] == (3, 3)
    assert "bn" not in legacy["bottom"] and "bn" in v2["bottom"]
    assert "bn" not in legacy["up"][0] and "bn" in v2["up"][0]
    assert "bn" not in legacy["top"] and "bn" in v2["top"]


def test_regularization_loss_variants():
    hp = HParams(im_size=32, n_channels=1, n_classes=3, n_out0=4, ks=3, n_layers=1)
    for variant, expect_zero in [("legacy", True), ("v2", False), ("duo", False)]:
        p = unet.init_params(jax.random.PRNGKey(0), hp, variant)
        loss = float(unet.regularization_loss(p, variant))
        assert (loss == 0.0) == expect_zero


def test_bf16_close_to_f32():
    hp = HParams(im_size=64, n_channels=1, n_classes=3, n_out0=8, ks=3, n_layers=2)
    params = unet.init_params(jax.random.PRNGKey(0), hp, "legacy")
    x = jnp.array(np.random.RandomState(0).randn(2, 64, 64, 1).astype(np.float32))
    y32 = np.asarray(unet.apply(params, x, hp, "legacy"))
    y16 = np.asarray(unet.apply(params, x, hp, "legacy", compute_dtype=jnp.bfloat16))
    assert np.abs(y32 - y16).max() < 0.05


def test_precision_modes_accepted():
    """precision strings thread through apply/engines (CPU executes all
    Precision levels identically in f32 — equality is exact here)."""
    import jax
    import jax.numpy as jnp

    from unmicst_tpu.core import unet
    from unmicst_tpu.core.hp import HParams

    hp = HParams(im_size=32, n_channels=1, n_classes=3, n_out0=4, ks=3,
                 n_extra_convs=0, n_layers=2, batch_size=2)
    params = unet.init_params(jax.random.PRNGKey(0), hp, "legacy")
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 1), jnp.float32)
    base = unet.apply(params, x, hp, "legacy")
    for prec in ("default", "high", "highest"):
        out = unet.apply(params, x, hp, "legacy", precision=prec)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   atol=1e-6)
    from unmicst_tpu.cli import precision_mode

    assert precision_mode("float32") == (None, "high")
    assert precision_mode("highest") == (None, "highest")
    assert precision_mode("bfloat16")[0] == jnp.bfloat16


@pytest.mark.parametrize("variant,extra", [
    ("v2", 0), ("legacy", 0), ("duo", 0), ("legacy", 1),
])
def test_residual_fusion_matches_unfused(variant, extra, rng):
    """Inference folds conv(x,K1)+conv(x,shortcut) into one conv when no
    extra convs exist (ks x ks add for v2, center-tap embed for the 1x1
    legacy shortcut); the unfused graph (fusion disabled) is the oracle,
    and extras must leave the graph unfused entirely."""
    hp = HParams(im_size=32, n_channels=2 if variant == "duo" else 1,
                 n_classes=3, n_out0=4, ks=3, n_layers=2,
                 n_extra_convs=extra, std_dev0=0.3)
    params = unet.init_params(jax.random.PRNGKey(0), hp, variant)
    x = jnp.asarray(
        rng.randn(2, 32, 32, hp.n_channels).astype(np.float32)
    )
    layer0 = params["down"][0]
    fusible = unet._fuse_residual(layer0, train=False)
    assert (fusible is None) == (extra > 0)
    assert unet._fuse_residual(layer0, train=True) is None
    fused_out = unet.apply(params, x, hp, variant)
    orig = unet._fuse_residual
    unet._fuse_residual = lambda layer, train: None
    try:
        unfused_out = unet.apply(params, x, hp, variant)
    finally:
        unet._fuse_residual = orig
    np.testing.assert_allclose(
        np.asarray(fused_out), np.asarray(unfused_out), atol=2e-5
    )
