"""int8 post-training quantization (core/quant.py + unet quant path).

CPU-mesh tests: numerical closeness of the quantized forward to the f32
forward, calibration plumbing, and engine integration.  Throughput claims
live in scripts/int8_probe*_tpu.py + BASELINE.md, not here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unmicst_tpu.core import quant, unet
from unmicst_tpu.core.hp import HParams

HP_V2 = HParams(
    im_size=32, n_channels=1, n_classes=3, n_out0=16, feat_maps_fact=2,
    down_samp_fact=2, ks=3, n_extra_convs=0, std_dev0=0.03, n_layers=3,
    batch_size=4,
)
HP_LEGACY = HParams(
    im_size=32, n_channels=1, n_classes=3, n_out0=16, feat_maps_fact=2,
    down_samp_fact=2, ks=3, n_extra_convs=2, std_dev0=0.03, n_layers=3,
    batch_size=4,
)


def _tiles(rng, hp, n=8):
    return rng.standard_normal((n, hp.im_size, hp.im_size, hp.n_channels)).astype(
        np.float32
    )


@pytest.mark.parametrize(
    "variant,hp", [("v2", HP_V2), ("legacy", HP_LEGACY), ("duo", HP_V2)]
)
def test_quantized_forward_close_to_f32(variant, hp):
    """Softmax outputs of the int8 forward within a small L-inf distance
    of f32 — the class-probability error that matters for the uint8 maps."""
    rng = np.random.RandomState(0)
    params = unet.init_params(jax.random.PRNGKey(1), hp, variant)
    tiles = _tiles(rng, hp, n=8)
    qs = quant.calibrate(params, tiles, hp, variant)
    ref = np.asarray(unet.apply(params, jnp.asarray(tiles), hp, variant))
    got = np.asarray(
        unet.apply(params, jnp.asarray(tiles), hp, variant, quant=qs)
    )
    err = np.abs(got - ref).max()
    # observed (fixed seeds): v2 0.0157, legacy 2.5e-5, duo 0.0182 —
    # the per-half concat scales (quant_conv_cat) are what keep v2/duo
    # under 0.02 (~5 uint8 levels); shared scales measured 0.025
    assert err < 0.02, err


def test_calibration_sites_cover_all_plain_convs():
    params = unet.init_params(jax.random.PRNGKey(0), HP_LEGACY, "legacy")
    sites = quant.conv_sites(params, HP_LEGACY)
    # the whole first block stays float (input-image quantization measured
    # as the dominant error source on real weights)
    assert not any(s.startswith("down0") for s in sites)
    # legacy with extras: no residual fusion -> per-conv sites
    assert "down1.k1" in sites and "down1.short" in sites
    assert "down1.extra0" in sites and "down1.extra1" in sites
    assert "bottom" in sites and "up0.k2" in sites and "up0.extra0" in sites
    # v2 (no extras): fused sites
    params2 = unet.init_params(jax.random.PRNGKey(0), HP_V2, "v2")
    sites2 = quant.conv_sites(params2, HP_V2)
    assert "down1" in sites2 and "down1.k1" not in sites2
    assert "down0" not in sites2


def test_host_fuse_matches_unet_fusion():
    """The numpy fuse mirror in conv_sites must equal unet._fuse_residual
    (legacy 1x1-center embedding included) — drift would silently change
    which kernel gets quantized."""
    for variant, hp in [("v2", HP_V2), ("legacy", HP_V2)]:
        params = unet.init_params(jax.random.PRNGKey(2), hp, variant)
        layer = params["down"][1]
        ref = unet._fuse_residual(layer, train=False)
        sites = quant.conv_sites(params, hp)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(sites["down1"]), rtol=0, atol=1e-7
        )


def test_quant_rejects_training():
    params = unet.init_params(jax.random.PRNGKey(0), HP_V2, "v2")
    with pytest.raises(ValueError, match="inference-only"):
        unet.apply(
            params, jnp.zeros((2, 32, 32, 1)), HP_V2, "v2", train=True,
            quant={"kernels": {}, "scales": {}},
        )


def test_per_channel_weight_scales():
    """A kernel with wildly different per-channel magnitudes must keep
    per-channel resolution (per-tensor scaling would crush the small
    channel into one or two int8 steps)."""
    w = np.zeros((3, 3, 4, 2), np.float32)
    w[..., 0] = np.linspace(-100, 100, 36).reshape(3, 3, 4)
    w[..., 1] = np.linspace(-0.01, 0.01, 36).reshape(3, 3, 4)
    qk = quant._quantize_kernel(jnp.asarray(w))
    deq = np.asarray(qk["w8"], np.float32) * np.asarray(qk["w_scale"])
    for co in range(w.shape[-1]):
        np.testing.assert_allclose(
            deq[..., co], w[..., co],
            atol=float(np.max(np.abs(w[..., co]))) / 127,
        )
    assert np.asarray(qk["w_scale"])[1] < 1e-3


def test_sample_tiles_shapes_and_normalization():
    hp = HP_V2
    img = (np.random.RandomState(0).rand(100, 90) * 60000).astype(np.float32)
    tiles = quant.sample_tiles(img, hp, mean=10.0, std=4.0, n=9)
    assert tiles.shape == (9, hp.im_size, hp.im_size, 1)
    # normalization applied: values centered near -(10)/4 scale
    lo, hi = tiles.min(), tiles.max()
    assert lo < 0 or hi < 60000  # not raw pixels
    # deterministic
    tiles2 = quant.sample_tiles(img, hp, mean=10.0, std=4.0, n=9)
    np.testing.assert_array_equal(tiles, tiles2)


def test_engine_quantized_mode(rng_engine=None):
    """InferenceEngine(quantized=True) runs end-to-end and stays close to
    the float engine on the same input."""
    from unmicst_tpu.infer import InferenceEngine

    hp = HP_V2
    params = unet.init_params(jax.random.PRNGKey(3), hp, "v2")
    img = (np.random.RandomState(1).rand(70, 83) * 255).astype(np.float32)
    img = (img - img.mean()) / (img.std() + 1e-6)
    f_eng = InferenceEngine(hp, params, "v2", 0.0, 1.0, tile_batch=8)
    q_eng = InferenceEngine(
        hp, params, "v2", 0.0, 1.0, tile_batch=8, quantized=True
    )
    ref = f_eng.infer(img)
    got = q_eng.infer(img)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 0.02
    # quant state is calibrated once and reused
    assert q_eng._quant is not None
    got2 = q_eng.infer(img)
    np.testing.assert_array_equal(got, got2)


def test_calibration_percentile_knob():
    """calibration_percentile threads from the engines into calibrate()
    and changes the activation scales (absmax >= any percentile clip)."""
    rng = np.random.RandomState(5)
    params = unet.init_params(jax.random.PRNGKey(2), HP_LEGACY, "legacy")
    tiles = _tiles(rng, HP_LEGACY, n=4)
    # inject one hot activation via a hot input pixel
    tiles[0, 0, 0, :] = 50.0
    q99 = quant.calibrate(params, tiles, HP_LEGACY, "legacy",
                          percentile=99.0)
    q100 = quant.calibrate(params, tiles, HP_LEGACY, "legacy",
                           percentile=100.0)
    # at least one site must see a larger (or equal) scale under absmax
    import numpy as _np

    a99 = _np.concatenate(
        [_np.ravel(q99["scales"][s]) for s in sorted(q99["scales"])]
    )
    a100 = _np.concatenate(
        [_np.ravel(q100["scales"][s]) for s in sorted(q100["scales"])]
    )
    # monotonic wherever neither side took the m==0 -> 1.0 fallback
    # (a dead channel's p99 is 0 while its absmax may be tiny-positive)
    real = (a99 != 1.0) & (a100 != 1.0)
    assert (a100[real] >= a99[real] - 1e-7).all()
    assert (a100[real] > a99[real] + 1e-7).any()

    from unmicst_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["x.tif", "--precision", "int8", "--calibrationPercentile", "100"]
    )
    assert args.calibrationPercentile == 100.0


def test_nearly_dead_channel_uses_absmax_fallback():
    """A channel that is zero at the calibration percentile but has
    nonzero absmax must calibrate to its absmax — not the 1.0 fallback
    that quantizes its whole (tiny) range to zero."""
    rng = np.random.RandomState(7)
    params = unet.init_params(jax.random.PRNGKey(3), HP_LEGACY, "legacy")
    tiles = _tiles(rng, HP_LEGACY, n=4)
    import numpy as _np

    # tiny-activation input: every channel is zero at p99 but has a
    # nonzero absmax, so every scale must be far below the 1.0 fallback
    qs = quant.calibrate(params, tiles * 1e-6, HP_LEGACY, "legacy",
                         percentile=99.0)
    live = _np.concatenate([
        _np.ravel(_np.asarray(v)) for v in qs["scales"].values()
    ])
    # all scales either reflect real (tiny) activations or true-dead 1.0;
    # at least some must be far below 1.0 (the absmax fallback at work)
    assert (live < 1e-3).any()


def test_bias_correction_mechanics():
    """calibrate(bias_correct=True) attaches a per-output-channel shift
    equal to the measured mean(conv_f32 - conv_int8) over the
    calibration tiles; quant_conv applies it verbatim, and the corrected
    site residual means out to ~zero on those tiles (the property the
    PTQ refinement buys)."""
    rng = np.random.RandomState(3)
    hp, variant = HP_V2, "v2"
    params = unet.init_params(jax.random.PRNGKey(2), hp, variant)
    tiles = _tiles(rng, hp, n=8)
    qs0 = quant.calibrate(params, tiles, hp, variant, bias_correct=False)
    qs1 = quant.calibrate(params, tiles, hp, variant, bias_correct=True)
    sites = quant.conv_sites(
        jax.tree_util.tree_map(np.asarray, params), hp
    )
    for site, qk in qs1["kernels"].items():
        assert qk["bias"].shape == (qk["w8"].shape[-1],), site
        assert "bias" not in qs0["kernels"][site], site

    # quant_conv applies the shift verbatim
    site = "bottom"
    cin = qs1["kernels"][site]["w8"].shape[2]
    x = jnp.asarray(rng.standard_normal((2, 8, 8, cin)).astype(np.float32))
    y0 = unet.quant_conv(x, qs0["kernels"][site], qs0["scales"][site])
    y1 = unet.quant_conv(x, qs1["kernels"][site], qs1["scales"][site])
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0) + np.asarray(qs1["kernels"][site]["bias"]),
        rtol=1e-6, atol=1e-6,
    )

    # corrected residuals mean ~0 per cout on the calibration tiles
    def resid_fn(p, t):
        out = {}

        def tap(s, xx):
            if s in sites:
                yf = unet.conv(xx, jnp.asarray(sites[s], jnp.float32))
                yq = unet.quant_conv(xx, qs1["kernels"][s], qs1["scales"][s])
                out[s] = jnp.mean(yf - yq, axis=(0, 1, 2))

        unet.apply(p, t, hp, variant, tap=tap)
        return out

    resid = jax.jit(resid_fn)(params, jnp.asarray(tiles))
    for s, r in resid.items():
        scale = float(np.abs(np.asarray(qs1["kernels"][s]["w_scale"])).mean())
        assert np.abs(np.asarray(r)).max() <= max(1e-4, 10 * scale), s

    # end-to-end: the corrected forward stays in the same error band
    ref = np.asarray(unet.apply(params, jnp.asarray(tiles), hp, variant))
    e0 = np.abs(np.asarray(
        unet.apply(params, jnp.asarray(tiles), hp, variant, quant=qs0)
    ) - ref).mean()
    e1 = np.abs(np.asarray(
        unet.apply(params, jnp.asarray(tiles), hp, variant, quant=qs1)
    ) - ref).mean()
    assert e1 <= 2 * e0 + 1e-6


def test_engine_quant_bias_correct_flag():
    """InferenceEngine's quant_bias_correct knob controls the bias
    vectors; DEFAULT-ON since the measured accuracy verdict
    (scripts/int8_bias_ab_report.json: flips 0.73 -> 0.42%, mean levels
    1.56 -> 0.79 on real weights), opt-out supported."""
    from unmicst_tpu.infer import InferenceEngine

    rng = np.random.RandomState(4)
    params = unet.init_params(jax.random.PRNGKey(5), HP_V2, "v2")
    raw = (rng.rand(96, 96) * 60000).astype(np.uint16)
    for flag in (False, True):
        eng = InferenceEngine(
            HP_V2, params, "v2", 0.3, 0.2, quantized=True,
            quant_bias_correct=flag,
        )
        maps = eng.infer_slide(raw)
        assert maps.shape == (3, 96, 96)
        has_bias = any(
            "bias" in qk for qk in eng._quant["kernels"].values()
        )
        assert has_bias == flag
