"""Pallas kernels (interpret mode on the CPU suite; compiled on TPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unmicst_tpu.core import tiler

# The measured-loser kernels live outside the production package
# (exhibits/pallas, see docs/PALLAS.md); their numerics stay pinned here.
_EXHIBITS = os.path.join(os.path.dirname(__file__), "..", "exhibits", "pallas")


def _load_exhibit(name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        f"exhibit_{name}", os.path.join(_EXHIBITS, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("t,k,p", [(6, 3, 128), (4, 2, 128)])
def test_fused_tail_matches_xla(rng, t, k, p):
    softmax_blend_weights = _load_exhibit("fused_tail").softmax_blend_weights

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
    blend_fold_pallas = _load_exhibit("blend").blend_fold_pallas
    g = tiler.make_grid(shape[0], shape[1], patch, margin)
    tiles = rng.rand(g.npr, g.npc, patch, patch, k).astype(np.float32)
    win = tiler.ramp_window(patch, margin)
    ref = np.asarray(tiler.fold(jnp.array(tiles * win[None, None, :, :, None]), g))
    got = np.asarray(blend_fold_pallas(jnp.array(tiles), win, g, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


# ---------------------------------------------------------------------------
# Pallas RDMA ring halo exchange (kernels/halo_rdma.py)
# ---------------------------------------------------------------------------


def _mesh8():
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return Mesh(np.array(devs[:8]), ("d",))


@pytest.mark.parametrize("shift", [1, -1])
def test_ring_shift_matches_ppermute(shift):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from unmicst_tpu.kernels.halo_rdma import ring_shift

    mesh = _mesh8()
    x = jnp.arange(8 * 16 * 128, dtype=jnp.float32).reshape(8, 16, 128)
    got = shard_map(
        lambda b: ring_shift(b, "d", shift, interpret=True),
        mesh=mesh, in_specs=P("d", None, None),
        out_specs=P("d", None, None), check_vma=False,
    )(x)
    ref = shard_map(
        lambda b: jax.lax.ppermute(
            b, "d", [(j, (j + shift) % 8) for j in range(8)]
        ),
        mesh=mesh, in_specs=P("d", None, None),
        out_specs=P("d", None, None),
    )(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_spatial_infer_pallas_halo_matches_ppermute(rng):
    """halo_impl='pallas' (RDMA ring kernels) == the ppermute path, whole
    pipeline, 8-way row shard."""
    from unmicst_tpu.core.hp import HParams
    from unmicst_tpu.core import unet as unet_mod
    from unmicst_tpu.runtime import halo

    mesh = _mesh8()
    hp = HParams(im_size=32, n_channels=1, n_classes=3, n_out0=6, ks=3,
                 n_extra_convs=0, n_layers=2, batch_size=8, std_dev0=0.5)
    params = unet_mod.init_params(jax.random.PRNGKey(3), hp, "legacy")
    img = rng.rand(150, 90).astype(np.float32)
    canvas = halo.build_canvas(img, hp, 8)
    kw = dict(mean=0.3, std=0.2, axis="d")
    ref = halo.spatial_infer(params, jnp.asarray(canvas), 150, 90, hp,
                             "legacy", mesh, **kw)
    got = halo.spatial_infer(params, jnp.asarray(canvas), 150, 90, hp,
                             "legacy", mesh, halo_impl="pallas",
                             pallas_interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("rows,cols", [(400, 90), (150, 90)])
def test_spatial_infer_pallas_overlap_matches_ppermute(rng, rows, cols):
    """halo_impl='pallas_overlap' (decoupled RDMA start/wait bracketing
    the interior forward) == the ppermute path.  400 rows gives R=3 tile
    rows per band (real interior/seam split); 150 gives R=1 (the overlap
    degenerates to the synchronous kernel path)."""
    from unmicst_tpu.core.hp import HParams
    from unmicst_tpu.core import unet as unet_mod
    from unmicst_tpu.runtime import halo

    mesh = _mesh8()
    hp = HParams(im_size=32, n_channels=1, n_classes=3, n_out0=6, ks=3,
                 n_extra_convs=0, n_layers=2, batch_size=8, std_dev0=0.5)
    params = unet_mod.init_params(jax.random.PRNGKey(3), hp, "legacy")
    img = rng.rand(rows, cols).astype(np.float32)
    canvas = halo.build_canvas(img, hp, 8)
    kw = dict(mean=0.3, std=0.2, axis="d")
    ref = halo.spatial_infer(params, jnp.asarray(canvas), rows, cols, hp,
                             "legacy", mesh, **kw)
    got = halo.spatial_infer(params, jnp.asarray(canvas), rows, cols, hp,
                             "legacy", mesh, halo_impl="pallas_overlap",
                             pallas_interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)
