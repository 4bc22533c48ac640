"""Space-to-depth level-0 refold (core/s2d.py): exactness + engine wiring.

The refold claims EXACT functional equality with ``unet.apply`` (same
f32 accumulation, sums reordered only) — so the tests pin tight
tolerances on random weights/inputs (boundaries included: random inputs
exercise the SAME-padding edges the parity-split kernels must
reproduce), both generations, fused and non-fused residual paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unmicst_tpu.core import s2d, unet
from unmicst_tpu.core.hp import HParams


def _legacy_hp(**kw):
    # nucleiDAPI-shaped (ks=5, extras=1) scaled to test size
    d = dict(im_size=64, n_channels=1, n_classes=3, n_out0=16, ks=5,
             n_extra_convs=1, n_layers=2)
    d.update(kw)
    return HParams(**d)


def _randomize_bn(params):
    """Non-trivial moving stats so bn_apply isn't the identity."""
    rs = np.random.RandomState(7)

    def walk(node):
        if isinstance(node, dict):
            if "bn" in node:
                c = node["bn"]["gamma"].shape[0]
                node["bn"]["moving_mean"] = rs.randn(c).astype(np.float32) * 0.1
                node["bn"]["moving_variance"] = (
                    1.0 + 0.3 * rs.rand(c)
                ).astype(np.float32)
                node["bn"]["gamma"] = (
                    1.0 + 0.2 * rs.randn(c)
                ).astype(np.float32)
                node["bn"]["beta"] = rs.randn(c).astype(np.float32) * 0.05
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(params)
    return params


def test_pack_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 10, 3), jnp.float32)
    assert jnp.array_equal(s2d.depth_to_space(s2d.space_to_depth(x)), x)
    # phase-major layout: packed channel (qy*2+qx)*C + c
    p = s2d.space_to_depth(x)
    assert jnp.array_equal(p[0, 1, 2, 1 * 3 + 2], x[0, 2 * 1 + 0, 2 * 2 + 1, 2])


@pytest.mark.parametrize("ks", [1, 3, 5])
def test_refold_conv_exact(ks):
    rs = np.random.RandomState(ks)
    k = rs.randn(ks, ks, 3, 5).astype(np.float32)
    x = jnp.asarray(rs.randn(2, 12, 16, 3), jnp.float32)
    ref = s2d.space_to_depth(unet.conv(x, jnp.asarray(k)))
    got = unet.conv(s2d.space_to_depth(x), jnp.asarray(s2d.refold_conv(k)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("ks", [3, 5])
def test_refold_conv_transpose_exact(ks):
    rs = np.random.RandomState(10 + ks)
    k = rs.randn(ks, ks, 4, 6).astype(np.float32)  # TF layout [ks,ks,O,I]
    h = jnp.asarray(rs.randn(2, 7, 9, 6), jnp.float32)
    ref = s2d.space_to_depth(unet.conv_transpose(h, jnp.asarray(k), 2))
    got = unet.conv(h, jnp.asarray(s2d.refold_conv_transpose(k)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_apply_exact_legacy():
    hp = _legacy_hp()
    params = _randomize_bn(unet.init_params(jax.random.PRNGKey(0), hp,
                                            "legacy"))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 1), jnp.float32)
    ref = unet.apply(params, x, hp, "legacy")
    packed = s2d.refold_params(params, hp, "legacy")
    got = s2d.apply(params, packed, x, hp, "legacy")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_apply_exact_v2_fused():
    # v2: ks x ks shortcut, no extras -> the fused-kernel path; deeper net
    hp = HParams(im_size=32, n_channels=1, n_classes=3, n_out0=8, ks=3,
                 n_extra_convs=0, n_layers=3)
    params = _randomize_bn(unet.init_params(jax.random.PRNGKey(2), hp, "v2"))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 1), jnp.float32)
    ref = unet.apply(params, x, hp, "v2")
    packed = s2d.refold_params(params, hp, "v2")
    got = s2d.apply(params, packed, x, hp, "v2")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_apply_bf16_close():
    # bf16 mode: same products/rounding, sums reordered -> close, not equal
    hp = _legacy_hp()
    params = unet.init_params(jax.random.PRNGKey(4), hp, "legacy")
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 64, 64, 1), jnp.float32)
    ref = unet.apply(params, x, hp, "legacy", compute_dtype=jnp.bfloat16)
    packed = s2d.refold_params(params, hp, "legacy")
    got = s2d.apply(params, packed, x, hp, "legacy",
                    compute_dtype=jnp.bfloat16)
    assert float(jnp.max(jnp.abs(ref - got))) < 0.02


def test_apply_odd_size_rejected():
    hp = _legacy_hp()
    params = unet.init_params(jax.random.PRNGKey(6), hp, "legacy")
    packed = s2d.refold_params(params, hp, "legacy")
    with pytest.raises(ValueError, match="even"):
        s2d.apply(params, packed, jnp.zeros((1, 63, 63, 1)), hp, "legacy")


def test_refold_rejects_even_ks_and_dsf():
    params = unet.init_params(jax.random.PRNGKey(7), _legacy_hp(), "legacy")
    # hp validation precedes any kernel access, so the standard-shaped
    # params are fine as a stand-in
    with pytest.raises(ValueError, match="odd"):
        s2d.refold_params(params, _legacy_hp(ks=4), "legacy")
    with pytest.raises(ValueError, match="down_samp_fact"):
        s2d.refold_params(params, _legacy_hp(down_samp_fact=3), "legacy")


def test_engine_s2d_matches_standard():
    from unmicst_tpu.infer import InferenceEngine

    hp = _legacy_hp()
    params = _randomize_bn(unet.init_params(jax.random.PRNGKey(8), hp,
                                            "legacy"))
    mk = lambda **kw: InferenceEngine(hp, params, "legacy", 0.2, 0.16,
                                      tile_batch=8, **kw)
    raw = (np.random.RandomState(9).rand(150, 170) * 60000).astype(np.uint16)
    a = mk().infer_slide(raw)
    b = mk(s2d=True).infer_slide(raw)
    # identical math modulo f32 sum order -> at most one uint8 rounding edge
    assert int(np.max(np.abs(a.astype(np.int16) - b.astype(np.int16)))) <= 1


def test_engine_s2d_quant_conflict():
    from unmicst_tpu.infer import InferenceEngine

    hp = _legacy_hp()
    params = unet.init_params(jax.random.PRNGKey(10), hp, "legacy")
    with pytest.raises(ValueError, match="s2d"):
        InferenceEngine(hp, params, "legacy", 0.2, 0.16, quantized=True,
                        s2d=True)
