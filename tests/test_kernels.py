"""Pallas kernels (interpret mode on the CPU suite; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unmicst_tpu.core import tiler
from unmicst_tpu.kernels.blend import blend_fold_pallas


@pytest.mark.parametrize("t,k,p", [(6, 3, 128), (4, 2, 128)])
def test_fused_tail_matches_xla(rng, t, k, p):
    from unmicst_tpu.kernels.fused_tail import softmax_blend_weights

    logits = jnp.asarray(rng.randn(t, k, p, p).astype(np.float32))
    win = tiler.ramp_window(p, p // 8)
    mask = jnp.asarray((rng.rand(t) > 0.3).astype(np.float32))
    ref = np.asarray(
        jax.nn.softmax(logits, axis=1)
        * jnp.asarray(win)[None, None]
        * mask[:, None, None, None]
    )
    got = np.asarray(softmax_blend_weights(logits, win, mask, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-6)


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
