"""Pallas kernels (interpret mode on the CPU suite; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unmicst_tpu.core import tiler
from unmicst_tpu.kernels.blend import blend_fold_pallas


@pytest.mark.parametrize(
    "shape,patch,margin,k",
    [((100, 120), 64, 8, 3), ((60, 60), 32, 4, 1), ((200, 90), 64, 8, 2)],
)
def test_blend_fold_matches_xla(rng, shape, patch, margin, k):
    g = tiler.make_grid(shape[0], shape[1], patch, margin)
    tiles = rng.rand(g.npr, g.npc, patch, patch, k).astype(np.float32)
    win = tiler.ramp_window(patch, margin)
    ref = np.asarray(tiler.fold(jnp.array(tiles * win[None, None, :, :, None]), g))
    got = np.asarray(blend_fold_pallas(jnp.array(tiles), win, g, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)
