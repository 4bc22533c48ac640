"""Preprocessing parity helpers (``toolbox/imtools.py``, CLI pipelines)."""

import numpy as np
import pytest

from unmicst_tpu.io import preprocess as pp


def test_im2double():
    assert pp.im2double(np.array([65535], np.uint16))[0] == 1.0
    assert pp.im2double(np.array([255], np.uint8))[0] == 1.0
    assert pp.im2double(np.array([0.5], np.float32)).dtype == np.float64
    x = np.array([1.5], np.float64)
    assert pp.im2double(x) is x


def test_rescale_intensity():
    x = np.linspace(0, 1, 11)
    y = pp.rescale_intensity(x, (0, 1), (0, 0.983))
    np.testing.assert_allclose(y, x * 0.983)
    # clipping at in_range
    y = pp.rescale_intensity(x, (0.2, 0.8), (0, 1))
    assert y[0] == 0 and y[-1] == 1
    np.testing.assert_allclose(y[5], (0.5 - 0.2) / 0.6)


def test_resize_identity_scales_dtype():
    x = (np.arange(12, dtype=np.uint16).reshape(3, 4) * 1000)
    y = pp.resize(x, (3, 4))
    np.testing.assert_allclose(y, x / 65535)


def test_resize_up_down(rng):
    x = rng.rand(40, 60)
    up = pp.resize(x, (80, 120))
    assert up.shape == (80, 120)
    # bilinear upsample preserves range and mean approximately
    assert abs(up.mean() - x.mean()) < 0.01
    down = pp.resize(x, (20, 30))
    assert down.shape == (20, 30)
    assert abs(down.mean() - x.mean()) < 0.01


def test_resize_matches_map_coordinates(rng):
    """The separable two-stage lerp must match the reference
    formulation — gaussian anti-alias + ndi.map_coordinates(order=1,
    mode='mirror') on the outer-product grid — to float noise, across
    up/down/mixed scales and degenerate 1-px axes."""
    from scipy import ndimage as ndi

    def ref(image, output_shape):
        img = pp.img_as_float(image)
        in_h, in_w = img.shape[:2]
        out_h, out_w = output_shape
        factors = (in_h / out_h, in_w / out_w)
        sig = [max(0.0, (f - 1.0) / 2.0) for f in factors]
        if any(s > 0 for s in sig):
            img = ndi.gaussian_filter(img, sig, mode="mirror")
        rows = (np.arange(out_h) + 0.5) * factors[0] - 0.5
        cols = (np.arange(out_w) + 0.5) * factors[1] - 0.5
        grid = np.meshgrid(rows, cols, indexing="ij")
        return ndi.map_coordinates(img, grid, order=1, mode="mirror")

    for shape, out in [((40, 60), (80, 120)), ((40, 60), (20, 30)),
                       ((33, 47), (21, 59)), ((5, 5), (13, 3)),
                       ((1, 7), (4, 9)), ((7, 1), (3, 5)),
                       ((64, 64), (64, 32))]:
        x = (rng.rand(*shape) * 65535).astype(np.uint16)
        np.testing.assert_allclose(pp.resize(x, out), ref(x, out),
                                   atol=1e-12, rtol=0)


def test_preprocess_channel_solo_quirk(rng):
    plane = (rng.rand(50, 60) * 60000).astype(np.uint16)
    a = pp.preprocess_channel(plane, 1.0, -1, use_rescaled=True)
    b = pp.preprocess_channel(plane, 1.0, -1, use_rescaled=False)
    # rescaled version tops out at 0.983 (the magic constant, UnMicst1-5.py:821)
    np.testing.assert_allclose(a.net_input.max(), 0.983, atol=1e-12)
    # solo quirk: resized-only plane (im2double of uint16)
    np.testing.assert_allclose(b.net_input, plane / 65535)
    assert a.raw_shape == (50, 60)


def test_preprocess_outlier_percentile(rng):
    plane = (rng.rand(100, 100) * 60000).astype(np.uint16)
    c = pp.preprocess_channel(plane, 1.0, 99.0)
    assert c.net_input.max() == 0.983  # values above p99 clipped to max


def test_float32_cast_to_uint16():
    plane = np.array([[1000.7, 2.2]], np.float32)
    c = pp.preprocess_channel(plane, 1.0, -1)
    # float32 inputs are truncated to uint16 first (UnMicst1-5.py:807-808)
    assert c.net_input.max() <= 0.983 + 1e-9


def test_postprocess_double_quantization():
    pm = np.full((10, 10), 0.5)
    out = pp.postprocess_pm(pm, (10, 10))
    assert out.dtype == np.uint8
    assert abs(int(out[0, 0]) - 127) <= 1


def test_preprocess_lut_fast_path_matches_float_path(rng):
    """The scale-1 LUT fast paths of preprocess_channel/postprocess_pm
    must be BIT-identical to the resize-based float path (the reference
    formula) — including the degenerate constant-plane, min>0, outlier-
    percentile, solo-quirk, and all-zero cases."""

    def float_path(plane, outlier, use_rescaled):
        resized = pp.resize(plane, plane.shape)
        if outlier == -1:
            max_limit = resized.max()
        else:
            max_limit = np.percentile(resized, outlier)
        rescaled = pp.im2double(pp.rescale_intensity(
            resized, (resized.min(), max_limit), (0, 0.983)))
        raw_d = pp.im2double(plane)
        raw_norm = raw_d / raw_d.max() if raw_d.max() > 0 else raw_d
        return (rescaled if use_rescaled else resized), raw_norm

    cases = [
        ((rng.rand(61, 83) * 65535).astype(np.uint16), -1, True),
        ((rng.rand(61, 83) * 255).astype(np.uint8), -1, True),
        (np.full((16, 16), 1234, np.uint16), -1, True),   # imax == imin
        (np.zeros((16, 16), np.uint16), -1, True),        # vmax == 0
        ((rng.rand(50, 50) * 1000 + 5000).astype(np.uint16), -1, True),
        ((rng.rand(64, 64) * 65535).astype(np.uint16), 99.0, True),
        ((rng.rand(64, 64) * 65535).astype(np.uint16), -1, False),
        ((rng.rand(64, 64) * 65535).astype(np.uint16), 95.0, False),
    ]
    for plane, outlier, use_rescaled in cases:
        got = pp.preprocess_channel(plane, 1.0, outlier, use_rescaled)
        net, raw = float_path(plane, outlier, use_rescaled)
        np.testing.assert_array_equal(got.net_input, net)
        np.testing.assert_array_equal(got.raw_norm, raw)
    pm = rng.rand(61, 83).astype(np.float32)
    q = np.uint8(255 * pm)
    np.testing.assert_array_equal(
        pp.postprocess_pm(pm, (61, 83)), np.uint8(255 * pp.resize(q, (61, 83)))
    )


def test_preview_u8_from_raw_matches_float_path(rng):
    """LUT preview == uint8(255 * raw_norm) bit-for-bit (uint16/uint8),
    and the float fallback handles other dtypes."""
    from unmicst_tpu.io import preprocess as pp

    for dtype, scale in ((np.uint16, 60000), (np.uint8, 255)):
        raw = (rng.rand(64, 80) * scale).astype(dtype)
        pc = pp.preprocess_channel(raw, 1.0, -1)
        expect = np.uint8(255 * pc.raw_norm)
        np.testing.assert_array_equal(pp.preview_u8_from_raw(raw), expect)
    # all-zero plane: no division blowup
    z = np.zeros((8, 8), np.uint16)
    assert pp.preview_u8_from_raw(z).sum() == 0
    # float32 input: both paths apply the uint16 parity cast first
    f = (rng.rand(16, 16) * 40000).astype(np.float32)
    pcf = pp.preprocess_channel(f, 1.0, -1)
    np.testing.assert_array_equal(
        pp.preview_u8_from_raw(f), np.uint8(255 * pcf.raw_norm)
    )


def test_resampled_stats_dense_plateau_bounded(rng, monkeypatch):
    """A saturation plateau puts the percentile inside one dense bin:
    the refinement path must stay within the collection cap AND still
    return np.percentile's exact answer."""
    from unmicst_tpu.io import preprocess as pp

    raw = (rng.rand(300, 300) * 60000).astype(np.uint16)
    raw[:150] = 60001  # 50% of pixels in one saturated value
    src = pp.ResampledSource(raw, 1.0)
    monkeypatch.setattr(pp, "_PERCENTILE_CAP", 1000)
    lo, hi = src.stats(90.0)
    resized = pp.resize(raw, raw.shape)
    assert abs(hi - np.percentile(resized, 90.0)) < 1e-9
    # percentile inside the plateau itself
    lo2, hi2 = src.stats(60.0)
    assert abs(hi2 - np.percentile(resized, 60.0)) < 1e-6


def test_resampled_zero_dim_raises(rng):
    from unmicst_tpu.io import preprocess as pp

    with pytest.raises(ValueError, match="shrinks"):
        pp.ResampledSource((rng.rand(5, 5) * 100).astype(np.uint16), 0.1)


def test_rescale_intensity_constant_passthrough():
    """Degenerate in_range clips to out_range (skimage >= 0.18): a
    constant slide passes through, it does not zero out."""
    from unmicst_tpu.io import preprocess as pp

    const = np.full((10, 10), 0.4)
    out = pp.rescale_intensity(const, (0.4, 0.4), (0, 0.983))
    np.testing.assert_allclose(out, 0.4)
    pc = pp.preprocess_channel(np.full((20, 20), 3000, np.uint16), 1.0, -1)
    assert float(pc.net_input.std()) == 0.0
    assert float(pc.net_input.mean()) > 0.04  # not zeroed
