"""imtools toolbox parity (``toolbox/imtools.py``)."""

import numpy as np

from unmicst_tpu.utils import imtools as it


def test_normalize(rng):
    x = rng.rand(10, 10) * 5 + 2
    y = it.normalize(x)
    assert y.min() == 0 and y.max() == 1
    const = np.ones((4, 4))
    assert it.normalize(const) is const  # identity for constant (ref :70-76)


def test_snormalize(rng):
    x = rng.rand(100) * 3
    y = it.snormalize(x)
    assert abs(y.mean()) < 1e-10 and abs(y.std() - 1) < 1e-10


def test_morphology():
    x = np.zeros((15, 15), bool)
    x[7, 7] = True
    d = it.imdilate(x, 3)
    assert d.sum() > 1 and d[7, 4] and d[7, 10]
    e = it.imerode(d, 3)
    assert e[7, 7]
    assert e.sum() <= x.sum() + 4


def test_filters(rng):
    x = rng.rand(20, 20)
    assert it.medfilt(x, 2).shape == x.shape
    assert (it.maxfilt(x, 2) >= x - 1e-12).all()
    assert (it.minfilt(x, 2) <= x + 1e-12).all()
    assert it.imgaussfilt(x, 1.5).shape == x.shape


def test_feature_names_and_shapes(rng):
    names = it.imderivatives(None, [1, 2], justfeatnames=True)
    assert len(names) == 16 and names[0] == "derivSigma1d0"
    x = rng.rand(16, 16)
    D = it.imderivatives(x, [1, 2])
    assert D.shape == (16, 16, 16)
    # normGrad consistency: sqrt(dx^2+dy^2)
    np.testing.assert_allclose(
        D[..., 6], np.sqrt(D[..., 1] ** 2 + D[..., 2] ** 2), atol=1e-12
    )
    F = it.imfeatures(x, sigma_deriv=1, sigma_log=1, loc_stats_rad=2)
    assert F.shape[-1] == 8 + 1 + 5
    assert it.imfeatures(justfeatnames=True, loc_stats_rad=2)[-1] == "locPtl90"


def test_feature_names_3d(rng):
    names = it.imderivatives3(None, 2, justfeatnames=True)
    assert len(names) == 12
    vol = rng.rand(8, 8, 8)
    D = it.imderivatives3(vol, 2)
    assert D.shape == (8, 8, 8, 12)


def test_thrsegment(rng):
    x = np.zeros((20, 20))
    x[8:12, 8:12] = 1.0
    m = it.thrsegment(x, 0.1, 0.3)
    assert m.dtype == bool and m[10, 10] and not m[0, 0]


def test_tif_roundtrip(tmp_path, rng):
    x = (rng.rand(30, 40) * 65535).astype(np.uint16)
    p = str(tmp_path / "x.tif")
    it.tifwrite(x, p)
    np.testing.assert_array_equal(it.tifread(p), x)


def test_imresize_uint8(rng):
    x = (rng.rand(20, 20) * 255).astype(np.uint8)
    y = it.imresize_uint8(x, (10, 10))
    assert y.shape == (10, 10) and y.dtype == np.uint8
    assert set(np.unique(y)).issubset(set(np.unique(x)))  # nearest neighbor
