"""Inference engine: single-pass multi-class == reference-style per-tile loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unmicst_tpu.core import tiler, unet
from unmicst_tpu.core.hp import HParams
from unmicst_tpu.infer import InferenceEngine


def _reference_style_inference(params, hp, variant, image, mean, std):
    """Transcription of singleImageInference semantics (UnMicst.py:520-541):
    pad, per-tile normalize+forward, window blend, divide, crop — per class.
    """
    g = tiler.make_grid(image.shape[0], image.shape[1], hp.im_size, hp.margin)
    win = np.asarray(tiler.ramp_window(hp.im_size, hp.margin))
    padded = np.zeros((g.padded_height, g.padded_width), np.float64)
    padded[g.margin : g.margin + g.height, g.margin : g.margin + g.width] = image
    out = np.zeros((hp.n_classes, g.padded_height, g.padded_width))
    cnt = np.zeros((g.padded_height, g.padded_width))
    for i in range(g.npr):
        for j in range(g.npc):
            r0, c0 = i * g.sub, j * g.sub
            patch = padded[r0 : r0 + hp.im_size, c0 : c0 + hp.im_size]
            x = ((patch - mean) / std).astype(np.float32)
            x = np.broadcast_to(x[None, :, :, None], (1,) + x.shape + (hp.n_channels,))
            probs = np.asarray(unet.apply(params, jnp.array(x), hp, variant))[0]
            for k in range(hp.n_classes):
                out[k, r0 : r0 + hp.im_size, c0 : c0 + hp.im_size] += probs[..., k] * win
            cnt[r0 : r0 + hp.im_size, c0 : c0 + hp.im_size] += win
    m = g.margin
    with np.errstate(invalid="ignore"):  # cnt==0 only in the cropped margin
        full = out / cnt[None]
    return full[:, m : m + g.height, m : m + g.width]


@pytest.fixture(scope="module")
def small_model():
    hp = HParams(
        im_size=32, n_channels=1, n_classes=3, n_out0=4, ks=3,
        n_extra_convs=0, n_layers=2, batch_size=4,
    )
    params = unet.init_params(jax.random.PRNGKey(7), hp, "legacy")
    return hp, params


def test_engine_matches_reference_loop(small_model, rng):
    hp, params = small_model
    image = rng.rand(70, 90).astype(np.float32)
    mean, std = 0.3, 0.2
    eng = InferenceEngine(hp, params, "legacy", mean, std, tile_batch=4)
    got = eng.infer(image)
    want = _reference_style_inference(params, hp, "legacy", image, mean, std)
    assert got.shape == want.shape == (3, 70, 90)
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("tile_batch", [1, 3, 16, 128])
def test_engine_batch_invariance(small_model, rng, tile_batch):
    hp, params = small_model
    image = rng.rand(75, 61).astype(np.float32)
    eng = InferenceEngine(hp, params, "legacy", 0.1, 0.4, tile_batch=tile_batch)
    base = InferenceEngine(hp, params, "legacy", 0.1, 0.4, tile_batch=7).infer(image)
    np.testing.assert_allclose(eng.infer(image), base, atol=1e-5)


def test_stack_channel_mode(rng):
    hp = HParams(im_size=32, n_channels=2, n_classes=3, n_out0=4, ks=3, n_layers=1)
    params = unet.init_params(jax.random.PRNGKey(0), hp, "duo")
    stack = rng.rand(2, 50, 40).astype(np.float32)
    eng = InferenceEngine(hp, params, "duo", 0.2, 0.3)
    got = eng.infer(stack, channel_mode="stack")
    assert got.shape == (3, 50, 40)
    # distinct channels must matter: permuting them changes the output
    got_swapped = eng.infer(stack[::-1], channel_mode="stack")
    assert np.abs(got - got_swapped).max() > 1e-6


def test_broadcast_channel_mode(rng):
    """Solo plumbing: one plane copied to every channel (UnMicst1-5.py:700-702)."""
    hp = HParams(im_size=32, n_channels=2, n_classes=2, n_out0=4, ks=3, n_layers=1)
    params = unet.init_params(jax.random.PRNGKey(0), hp, "v2")
    plane = rng.rand(40, 40).astype(np.float32)
    eng = InferenceEngine(hp, params, "v2", 0.2, 0.3)
    a = eng.infer(plane, channel_mode="broadcast")
    b = eng.infer(
        np.stack([plane, plane]), channel_mode="stack"
    )
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_image_smaller_than_patch(small_model, rng):
    hp, params = small_model
    image = rng.rand(20, 25).astype(np.float32)
    eng = InferenceEngine(hp, params, "legacy", 0.0, 1.0)
    got = eng.infer(image)
    want = _reference_style_inference(params, hp, "legacy", image, 0.0, 1.0)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_carry_fold_branch_matches_stacked(model_bundle_or_none=None):
    """The large-canvas carry-accumulated fold == the stacked-strips fold
    (stack_fold_max_bytes=0 forces the carry branch on a small canvas)."""
    import jax

    from unmicst_tpu.core import unet
    from unmicst_tpu.core.hp import HParams
    from unmicst_tpu.infer import InferenceEngine

    hp = HParams(im_size=32, n_channels=1, n_classes=3, n_out0=6, ks=3,
                 n_extra_convs=0, n_layers=2, batch_size=8, std_dev0=0.5)
    params = unet.init_params(jax.random.PRNGKey(11), hp, "legacy")
    rng_l = np.random.RandomState(5)
    raw = (rng_l.rand(150, 90) * 60000).astype(np.uint16)
    stacked = InferenceEngine(hp, params, "legacy", 0.3, 0.2).infer_slide(raw)
    carried = InferenceEngine(
        hp, params, "legacy", 0.3, 0.2, stack_fold_max_bytes=0
    ).infer_slide(raw)
    np.testing.assert_array_equal(stacked, carried)


def test_infer_slide_stack_matches_host_path(small_model, rng):
    """Device-side duo stack (per-channel on-chip ranges) == the host
    preprocess + float infer path within 1 uint8 level."""
    from unmicst_tpu.io import preprocess as pp

    hp, params = small_model
    import dataclasses

    hp2 = dataclasses.replace(hp, n_channels=2)
    from unmicst_tpu.core import unet

    params2 = unet.init_params(jax.random.PRNGKey(3), hp2, "duo")
    eng = InferenceEngine(hp2, params2, "duo", 0.2, 0.2, tile_batch=16)
    a = (rng.rand(70, 90) * 60000).astype(np.uint16)
    b = (rng.rand(70, 90) * 30000).astype(np.uint16)
    maps = eng.infer_slide_stack([a, b])
    host = np.stack([
        pp.preprocess_channel(x, 1.0, -1).net_input for x in (a, b)
    ]).astype(np.float32)
    probs = eng.infer(host, "stack")
    expect = np.uint8(255 * probs)
    assert np.abs(maps.astype(int) - expect.astype(int)).max() <= 1
    # classes selection returns requested planes in order
    sub = eng.infer_slide_stack([a, b], classes=(2, 0))
    assert np.abs(sub[0].astype(int) - maps[2].astype(int)).max() == 0
    assert np.abs(sub[1].astype(int) - maps[0].astype(int)).max() == 0


def test_infer_slide_rescale_false_rejects_unknown_dtype(small_model, rng):
    """rescale=False needs a known im2double scale; other dtypes raise
    (the streaming engine applies the same guard) instead of silently
    feeding unnormalized values."""
    hp, params = small_model
    eng = InferenceEngine(hp, params, "legacy", 0.2, 0.2, tile_batch=8)
    bad = (rng.rand(40, 40) * 1000).astype(np.int16)
    with pytest.raises(ValueError, match="uint8/uint16"):
        eng.infer_slide(bad, rescale=False)
    # with rescale the data-derived range normalizes any dtype
    ok = eng.infer_slide(bad, rescale=True)
    assert ok.dtype == np.uint8


def test_class_index_validation(small_model, rng):
    """OOB/negative class indexes raise instead of jit's silent clamp
    (probs[..., [5]] on a 3-class model returns class 2's plane!)."""
    hp, params = small_model
    eng = InferenceEngine(hp, params, "legacy", 0.2, 0.2, tile_batch=8)
    raw = (rng.rand(40, 40) * 60000).astype(np.uint16)
    for bad in ((hp.n_classes,), (-1,), (0, 7)):
        with pytest.raises(ValueError, match="out of range"):
            eng.infer_slide(raw, classes=bad)


def test_stack_mixed_dtypes_rejected(rng):
    """np.stack silently promotes uint8+uint16 -> uint16; the stack path
    must reject the mix instead of im2double-ing by the wrong constant."""
    import jax

    from unmicst_tpu.core import unet
    from unmicst_tpu.core.hp import HParams

    hp = HParams(im_size=32, n_channels=2, n_classes=3, n_out0=4, ks=3,
                 n_extra_convs=0, n_layers=2, batch_size=8, std_dev0=0.5)
    params = unet.init_params(jax.random.PRNGKey(3), hp, "v2")
    eng = InferenceEngine(hp, params, "v2", 0.2, 0.2, tile_batch=8)
    a = (rng.rand(40, 40) * 250).astype(np.uint8)
    b = (rng.rand(40, 40) * 60000).astype(np.uint16)
    with pytest.raises(ValueError, match="disagree on dtype"):
        eng.infer_slide_stack([a, b])


def test_empty_image_clear_error(small_model):
    hp, params = small_model
    eng = InferenceEngine(hp, params, "legacy", 0.2, 0.2, tile_batch=8)
    with pytest.raises(ValueError, match="empty image"):
        eng.infer_slide(np.zeros((0, 40), np.uint16))


def test_outlier_values_share_one_program(small_model, rng):
    """Distinct outlier percentiles ride as a traced argument: one
    compiled program, correct per-value results."""
    hp, params = small_model
    eng = InferenceEngine(hp, params, "legacy", 0.2, 0.2, tile_batch=8)
    raw = (rng.rand(64, 64) * 60000).astype(np.uint16)
    def n_slide():
        return sum(1 for k in eng._compiled._entries if k[0] == "slide")

    n0 = n_slide()
    out_a = eng.infer_slide(raw, outlier=99.0)
    out_b = eng.infer_slide(raw, outlier=90.0)
    out_max = eng.infer_slide(raw, outlier=-1)
    # two slide programs total: percentile-parameterized + max-sentinel
    # (the inner core-canvas program caches under its own key)
    assert n_slide() - n0 == 2
    # and the traced q actually changes the result
    assert not np.array_equal(out_a, out_b)
    assert not np.array_equal(out_b, out_max)


def test_pinned_range_matches_derived(small_model, rng):
    """in_range=(data min, data max) reproduces the data-derived default
    bit-for-bit, shares one program across distinct pinned values, and
    an intentionally different range changes the maps."""
    hp, params = small_model
    eng = InferenceEngine(hp, params, "legacy", 0.2, 0.2, tile_batch=8)
    raw = (rng.rand(64, 64) * 60000).astype(np.uint16)

    def n_slide():
        return sum(1 for k in eng._compiled._entries if k[0] == "slide")

    derived = eng.infer_slide(raw)
    n0 = n_slide()
    pinned = eng.infer_slide(
        raw, in_range=(float(raw.min()), float(raw.max()))
    )
    np.testing.assert_array_equal(pinned, derived)
    wider = eng.infer_slide(raw, in_range=(0.0, 65535.0))
    assert not np.array_equal(wider, derived)
    assert n_slide() - n0 == 1  # both pinned calls share one program


def test_pinned_range_makes_bands_consistent(small_model, rng):
    """The ROI scenario: a band whose local stats differ from the global
    range normalizes identically to the full slide ONLY when the global
    range is pinned (grid-aligned band: crop is then bit-identical)."""
    hp, params = small_model
    eng = InferenceEngine(hp, params, "legacy", 0.2, 0.2, tile_batch=8)
    img = (rng.rand(160, 64) * 20000).astype(np.uint16)
    img[:16] = 60000  # bright blob OUTSIDE the band: global max != band max
    full = eng.infer_slide(
        img, in_range=(float(img.min()), float(img.max()))
    )
    # band starting at a sub-stride multiple shares the full run's grid
    a = 4 * (hp.im_size - 2 * hp.margin)
    band = img[a:]
    pinned = eng.infer_slide(
        band, in_range=(float(img.min()), float(img.max()))
    )
    # the band's top tile-row sees canvas zeros where the full run has
    # real context rows — compare beyond it (the serve ROI path reads
    # one extra net-tile of context and trims it for exactly this
    # reason); past that, pinned normalization makes the crop identical
    t = hp.im_size
    np.testing.assert_array_equal(pinned[:, t:], full[:, a + t:])
    # without pinning, band-local stats shift the normalization (the
    # tiny random-weight net is nearly input-insensitive, so assert
    # inequality rather than a magnitude)
    local = eng.infer_slide(band)
    assert not np.array_equal(local[:, t:], pinned[:, t:])


def test_pinned_range_stack_per_channel(rng):
    """Duo stack: per-channel pinned pairs == the data-derived per-channel
    ranges; a single pair broadcasts."""
    import jax as _jax

    from unmicst_tpu.core import unet as _unet
    from unmicst_tpu.core.hp import HParams as _HP

    hp = _HP(im_size=32, n_channels=2, n_classes=3, n_out0=4, ks=3,
             n_extra_convs=0, n_layers=2, batch_size=4)
    params = _unet.init_params(_jax.random.PRNGKey(3), hp, "duo")
    eng = InferenceEngine(hp, params, "duo", 0.2, 0.2, tile_batch=8)
    a = (rng.rand(48, 40) * 30000).astype(np.uint16)
    b = (rng.rand(48, 40) * 60000).astype(np.uint16)
    derived = eng.infer_slide_stack([a, b])
    pinned = eng.infer_slide_stack(
        [a, b],
        in_range=[(float(a.min()), float(a.max())),
                  (float(b.min()), float(b.max()))],
    )
    np.testing.assert_array_equal(pinned, derived)
    broadcast = eng.infer_slide_stack([a, b], in_range=(0.0, 65535.0))
    assert broadcast.shape == derived.shape


def test_pinned_range_validation(small_model, rng):
    hp, params = small_model
    eng = InferenceEngine(hp, params, "legacy", 0.2, 0.2, tile_batch=8)
    raw = (rng.rand(48, 48) * 60000).astype(np.uint16)
    with pytest.raises(ValueError, match="lo < hi"):
        eng.infer_slide(raw, in_range=(100.0, 100.0))
    with pytest.raises(ValueError, match="finite"):
        eng.infer_slide(raw, in_range=(0.0, float("nan")))
    with pytest.raises(ValueError, match="rescale"):
        eng.infer_slide(raw, in_range=(0.0, 1000.0), rescale=False)
    with pytest.raises(ValueError, match="pair"):
        eng.infer_slide(raw, in_range=(0.0, 1.0, 2.0))


def test_pinned_range_composes_with_scale_classes_int8(small_model, rng):
    """in_range composes with scaling_factor, classes subsets, and int8
    PTQ: pinning the data's own range reproduces each derived run
    bit-for-bit (same normalization -> same calibration -> same maps)."""
    hp, params = small_model
    raw = (rng.rand(96, 80) * 60000).astype(np.uint16)
    # place the extremes ON the calibration sampler's ::4 decimation
    # grid, so the derived int8 calibration sees exactly the pinned
    # range (the device program always uses the exact full-plane range)
    raw[0, 0], raw[0, 4] = 0, 60000
    pin = (float(raw.min()), float(raw.max()))

    eng = InferenceEngine(hp, params, "legacy", 0.2, 0.2, tile_batch=8)
    # scale 1: bit-equal (same range, same math); the pinned range also
    # overrides the outlier percentile entirely
    for kw in (dict(classes=(2, 0)), dict(outlier=99.5)):
        derived = eng.infer_slide(raw, **{k: v for k, v in kw.items()
                                          if k != "outlier"})
        pinned = eng.infer_slide(raw, in_range=pin, **kw)
        np.testing.assert_array_equal(pinned, derived, err_msg=str(kw))
    # scaling_factor != 1: the derived range is computed on the RESIZED
    # plane (the reference's resize-then-rescale order), so pinning the
    # raw-plane extremes is deliberately close-but-not-bit-equal —
    # anti-aliasing pulls the resized extremes inward a fraction of a
    # percent
    for kw in (dict(scaling_factor=0.5),
               dict(scaling_factor=2.0, classes=(1,))):
        derived = eng.infer_slide(raw, **kw)
        pinned = eng.infer_slide(raw, in_range=pin, **kw)
        d = np.abs(pinned.astype(int) - derived.astype(int))
        # <=2 levels; at upscales the output double-quantization turns
        # the tiny range shift into widespread +-1 wobble — bound the
        # magnitude, not the count
        assert d.max() <= 2, (kw, d.max())

    # int8: one engine calibrated with the pinned range equals one
    # calibrated on the (identical) derived range
    q1 = InferenceEngine(hp, params, "legacy", 0.2, 0.2, tile_batch=8,
                         quantized=True)
    q2 = InferenceEngine(hp, params, "legacy", 0.2, 0.2, tile_batch=8,
                         quantized=True)
    a = q1.infer_slide(raw)
    b = q2.infer_slide(raw, in_range=pin)
    np.testing.assert_array_equal(a, b)


def test_device_plane_pans_match_host(small_model, rng):
    """Device-resident slide path (viewer pans): a band cut ON DEVICE
    from a pinned plane is byte-identical to feeding the same band from
    host, every same-sized window shares ONE program (offsets are
    traced), and out-of-plane bands raise instead of silently clamping."""
    hp, params = small_model
    eng = InferenceEngine(hp, params, "legacy", 0.2, 0.2, tile_batch=8)
    raw = (rng.rand(200, 180) * 60000).astype(np.uint16)
    plane = eng.device_plane(raw)

    def n_dev():
        return sum(
            1 for k in eng._compiled._entries if k[0] == "slide_dev"
        )

    n0 = n_dev()
    pin = (float(raw.min()), float(raw.max()))
    for r0, c0 in [(0, 0), (56, 0), (0, 76), (104, 84), (3, 5)]:
        dev = eng.infer_slide_device(
            plane, r0, c0, 96, 96, in_range=pin
        )
        host = eng.infer_slide(
            np.ascontiguousarray(raw[r0:r0 + 96, c0:c0 + 96]),
            in_range=pin,
        )
        np.testing.assert_array_equal(dev, host, err_msg=f"{(r0, c0)}")
    assert n_dev() - n0 == 1  # all five offsets rode one program
    # band-local (derived) stats also match the host band path
    dev = eng.infer_slide_device(plane, 8, 16, 96, 96, outlier=99.0)
    host = eng.infer_slide(
        np.ascontiguousarray(raw[8:104, 16:112]), outlier=99.0
    )
    np.testing.assert_array_equal(dev, host)
    # out-of-plane bands must error, not clamp to a shifted window
    for bad in [(-1, 0), (120, 0), (0, 100)]:
        with pytest.raises(ValueError, match="outside"):
            eng.infer_slide_device(plane, bad[0], bad[1], 96, 96)
    # float32 sources parity-cast exactly like infer_slide
    rawf = rng.rand(64, 64).astype(np.float32) * 300
    pf = eng.device_plane(rawf)
    np.testing.assert_array_equal(
        eng.infer_slide_device(pf, 0, 0, 64, 64),
        eng.infer_slide(rawf),
    )


def test_device_plane_trim_crops_on_device(small_model, rng):
    """``trim=``: the maps are cropped ON DEVICE before the fetch —
    byte-identical to the host-side crop of the untrimmed call, traced
    offsets share one program per (th, tw), bad trims raise."""
    hp, params = small_model
    eng = InferenceEngine(hp, params, "legacy", 0.2, 0.2, tile_batch=8)
    raw = (rng.rand(200, 180) * 60000).astype(np.uint16)
    plane = eng.device_plane(raw)
    pin = (float(raw.min()), float(raw.max()))

    def n_dev():
        return sum(
            1 for k in eng._compiled._entries if k[0] == "slide_dev"
        )

    full = eng.infer_slide_device(plane, 8, 16, 96, 96, in_range=pin)
    n0 = n_dev()
    for tr0, tc0, th, tw in [(24, 32, 40, 40), (0, 0, 40, 40),
                             (56, 56, 40, 40)]:
        cut = eng.infer_slide_device(
            plane, 8, 16, 96, 96, in_range=pin, trim=(tr0, tc0, th, tw)
        )
        assert cut.shape == full.shape[:1] + (th, tw)
        np.testing.assert_array_equal(
            cut, full[:, tr0:tr0 + th, tc0:tc0 + tw],
            err_msg=f"{(tr0, tc0)}",
        )
    assert n_dev() - n0 == 1  # all three trim offsets rode one program
    # derived band stats (outlier percentile) see the WHOLE band, so a
    # trimmed call still normalizes like the untrimmed one
    np.testing.assert_array_equal(
        eng.infer_slide_device(plane, 8, 16, 96, 96, outlier=99.0,
                               trim=(10, 20, 32, 48)),
        eng.infer_slide_device(
            plane, 8, 16, 96, 96, outlier=99.0
        )[:, 10:42, 20:68],
    )
    for bad in [(-1, 0, 32, 32), (0, 0, 97, 32), (70, 0, 32, 32),
                (0, 0, 0, 32)]:
        with pytest.raises(ValueError, match="trim"):
            eng.infer_slide_device(plane, 8, 16, 96, 96, trim=bad)


def test_device_plane_stack_pans_match_host(rng):
    """Duo: pinned [C, H, W] stack pans == host stack bands, including
    per-channel pinned ranges; channel-count mismatches raise."""
    hp = HParams(
        im_size=32, n_channels=2, n_classes=3, n_out0=4, ks=3, n_layers=1
    )
    params = unet.init_params(jax.random.PRNGKey(0), hp, "duo")
    eng = InferenceEngine(hp, params, "duo", 0.2, 0.3, tile_batch=8)
    raws = (rng.rand(2, 150, 120) * 60000).astype(np.uint16)
    planes = eng.device_plane(raws)
    pin = [(float(r.min()), float(r.max())) for r in raws]
    for r0, c0 in [(0, 0), (30, 40), (86, 56)]:
        dev = eng.infer_slide_stack_device(
            planes, r0, c0, 64, 64, in_range=pin
        )
        host = eng.infer_slide_stack(
            [np.ascontiguousarray(r[r0:r0 + 64, c0:c0 + 64])
             for r in raws],
            in_range=pin,
        )
        np.testing.assert_array_equal(dev, host, err_msg=f"{(r0, c0)}")
    # trim= on the stack path: device crop == host crop of the full band
    np.testing.assert_array_equal(
        eng.infer_slide_stack_device(
            planes, 30, 40, 64, 64, in_range=pin, trim=(8, 12, 32, 40)
        ),
        eng.infer_slide_stack_device(
            planes, 30, 40, 64, 64, in_range=pin
        )[:, 8:40, 12:52],
    )
    with pytest.raises(ValueError, match="channels"):
        eng.infer_slide_stack_device(planes[:1], 0, 0, 64, 64)


def test_device_plane_int8_calibration(small_model, rng):
    """An int8 engine calibrates when the plane is pinned; an
    uncalibrated engine given a foreign plane refuses loudly; the
    device pan equals the host int8 pan."""
    hp, params = small_model
    raw = (rng.rand(160, 160) * 60000).astype(np.uint16)
    q1 = InferenceEngine(hp, params, "legacy", 0.2, 0.2, tile_batch=8,
                         quantized=True)
    plane = q1.device_plane(raw)  # calibrates q1 on the full plane
    assert q1._quant is not None
    dev = q1.infer_slide_device(plane, 32, 32, 96, 96)
    # same QuantState, host-fed band: byte-identical
    host = q1.infer_slide(np.ascontiguousarray(raw[32:128, 32:128]))
    np.testing.assert_array_equal(dev, host)
    # pin-time calibration == infer_slide's own full-plane calibration
    q2 = InferenceEngine(hp, params, "legacy", 0.2, 0.2, tile_batch=8,
                         quantized=True)
    np.testing.assert_array_equal(q2.infer_slide(raw),
                                  q1.infer_slide(raw))
    q3 = InferenceEngine(hp, params, "legacy", 0.2, 0.2, tile_batch=8,
                         quantized=True)
    with pytest.raises(RuntimeError, match="uncalibrated"):
        q3.infer_slide_device(jnp.asarray(raw), 0, 0, 96, 96)
