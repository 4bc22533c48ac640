"""3D tiler: PI3D-equivalent semantics (``PartitionOfImage.py:150-304``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from unmicst_tpu.core import tiler3d as t3


def _reference_window3d(patch, margin):
    w = np.ones((patch, patch, patch))
    w[[0, -1], :, :] = 0
    w[:, [0, -1], :] = 0
    w[:, :, [0, -1]] = 0
    for i in range(1, 2 * margin):
        v = i / (2 * margin)
        w[[i, -i - 1], i:-i, i:-i] = v
        w[i:-i, [i, -i - 1], i:-i] = v
        w[i:-i, i:-i, [i, -i - 1]] = v
    return w


def test_ramp_window3d():
    assert np.allclose(
        np.asarray(t3.ramp_window3d(16, 2)), _reference_window3d(16, 2)
    )


@pytest.mark.parametrize("shape", [(40, 50, 60), (20, 20, 20)])
def test_fold3d_matches_scatter(rng, shape):
    Z, H, W = shape
    patch, margin = 16, 2
    g = t3.make_grid3d(Z, H, W, patch, margin)
    vol = rng.rand(Z, H, W).astype(np.float32)
    win = np.asarray(t3.ramp_window3d(patch, margin))
    padded = np.asarray(t3.pad_canvas3d(jnp.array(vol), g))
    tiles = np.asarray(t3.unfold3d(jnp.array(padded), g))

    pz, pr, pc = g.padded
    out = np.zeros((pz, pr, pc))
    cnt = np.zeros_like(out)
    for iz in range(g.npz):
        for ir in range(g.npr):
            for ic in range(g.npc):
                z0, r0, c0 = iz * g.sub, ir * g.sub, ic * g.sub
                assert np.array_equal(
                    tiles[iz, ir, ic],
                    padded[z0 : z0 + patch, r0 : r0 + patch, c0 : c0 + patch],
                )
                out[z0 : z0 + patch, r0 : r0 + patch, c0 : c0 + patch] += (
                    tiles[iz, ir, ic] * win
                )
                cnt[z0 : z0 + patch, r0 : r0 + patch, c0 : c0 + patch] += win

    folded = np.asarray(t3.fold3d(jnp.array(tiles * win[None, None, None]), g))
    count = np.asarray(t3.count_map3d(g, jnp.array(win)))
    np.testing.assert_allclose(folded, out, atol=1e-4)
    np.testing.assert_allclose(count, cnt, atol=1e-4)
    valid = np.asarray(
        t3.crop_valid3d(jnp.array(folded / np.maximum(count, 1e-12)), g)
    )
    np.testing.assert_allclose(valid, vol, atol=1e-5)


def test_grid3d_validation():
    # same guards as the 2D TileGrid: margin=0 zeroes the window's outer
    # ring -> zero blend count on every seam plane (NaN after the divide)
    with pytest.raises(ValueError):
        t3.make_grid3d(0, 10, 10, 16, 2)
    with pytest.raises(ValueError):
        t3.make_grid3d(10, 10, 10, 16, 0)
    with pytest.raises(ValueError):
        t3.make_grid3d(10, 10, 10, 16, -1)
    with pytest.raises(ValueError):
        t3.make_grid3d(10, 10, 10, 4, 2)  # patch <= 2*margin


def test_pad_canvas3d_shape_guard():
    g = t3.make_grid3d(10, 12, 14, 16, 2)
    with pytest.raises(ValueError):
        t3.pad_canvas3d(jnp.zeros((10, 12, 15)), g)
