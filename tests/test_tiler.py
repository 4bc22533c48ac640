"""Tiler: PI2D-equivalent semantics (``toolbox/PartitionOfImage.py:6-147``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from unmicst_tpu.core import tiler


def _reference_window(patch, margin):
    # direct transcription of the spec at PartitionOfImage.py:30-39
    w = np.ones((patch, patch))
    w[[0, -1], :] = 0
    w[:, [0, -1]] = 0
    for i in range(1, 2 * margin):
        v = i / (2 * margin)
        w[i, i:-i] = v
        w[-i - 1, i:-i] = v
        w[i:-i, i] = v
        w[i:-i, -i - 1] = v
    return w


@pytest.mark.parametrize("patch,margin", [(128, 16), (64, 8), (256, 32)])
def test_ramp_window(patch, margin):
    assert np.allclose(
        np.asarray(tiler.ramp_window(patch, margin)), _reference_window(patch, margin)
    )


@pytest.mark.parametrize(
    "shape,patch,margin",
    [((832, 960), 128, 16), ((96, 96), 64, 8), ((200, 333), 64, 8), ((64, 64), 128, 16)],
)
def test_fold_matches_sequential_scatter(rng, shape, patch, margin):
    """fold/unfold == the reference's per-tile scatter loop (:92-106)."""
    H, W = shape
    g = tiler.make_grid(H, W, patch, margin)
    img = rng.rand(H, W).astype(np.float32)
    win = np.asarray(tiler.ramp_window(patch, margin))
    padded = np.asarray(tiler.pad_canvas(jnp.array(img), g))
    tiles = np.asarray(tiler.unfold(jnp.array(padded), g))

    out = np.zeros((g.padded_height, g.padded_width))
    cnt = np.zeros_like(out)
    for i in range(g.npr):
        for j in range(g.npc):
            r0, c0 = i * g.sub, j * g.sub
            assert np.array_equal(tiles[i, j], padded[r0 : r0 + patch, c0 : c0 + patch])
            out[r0 : r0 + patch, c0 : c0 + patch] += tiles[i, j] * win
            cnt[r0 : r0 + patch, c0 : c0 + patch] += win

    folded = np.asarray(tiler.fold(jnp.array(tiles * win[None, None]), g))
    count = np.asarray(tiler.count_map(g, jnp.array(win)))
    np.testing.assert_allclose(folded, out, atol=1e-4)
    np.testing.assert_allclose(count, cnt, atol=1e-4)


def test_roundtrip_identity(rng):
    """PI2D.demo's property (:125-147): blend(tile(x)) == x."""
    H, W, patch, margin = 200, 170, 64, 8
    g = tiler.make_grid(H, W, patch, margin)
    img = rng.rand(H, W).astype(np.float32)
    win = tiler.ramp_window(patch, margin)
    tiles = tiler.unfold(tiler.pad_canvas(jnp.array(img), g), g)
    folded = tiler.fold(tiles * win[None, None], g)
    count = tiler.count_map(g, win)
    valid = np.asarray(tiler.crop_valid(folded / jnp.maximum(count, 1e-12), g))
    np.testing.assert_allclose(valid, img, atol=1e-5)


def test_fold_with_channels(rng):
    H, W, patch, margin = 100, 120, 64, 8
    g = tiler.make_grid(H, W, patch, margin)
    tiles = rng.rand(g.npr, g.npc, patch, patch, 3).astype(np.float32)
    win = np.asarray(tiler.ramp_window(patch, margin))
    folded = np.asarray(tiler.fold(jnp.array(tiles * win[None, None, :, :, None]), g))
    assert folded.shape == (g.padded_height, g.padded_width, 3)
    # per-channel equals scalar fold of that channel
    for c in range(3):
        fc = np.asarray(tiler.fold(jnp.array(tiles[..., c] * win[None, None]), g))
        np.testing.assert_allclose(folded[..., c], fc, atol=1e-4)


def test_grid_rejects_bad_margin():
    with pytest.raises(ValueError):
        tiler.make_grid(100, 100, 64, 32)  # sub == 0
    with pytest.raises(ValueError):
        tiler.make_grid(100, 100, 64, 25)  # sub=14 < 2*margin
