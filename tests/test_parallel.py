"""Multi-device paths on the 8-device CPU mesh: halo CP, DP/TP training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unmicst_tpu.core import unet
from unmicst_tpu.core.hp import HParams
from unmicst_tpu.infer import InferenceEngine
from unmicst_tpu.runtime import halo
from unmicst_tpu.runtime.mesh import data_sharding, make_mesh, put_params, shard_params
from unmicst_tpu import train as tr


@pytest.fixture(scope="module")
def model():
    hp = HParams(
        im_size=32, n_channels=1, n_classes=3, n_out0=4, ks=3,
        n_extra_convs=0, n_layers=2, batch_size=8,
    )
    params = unet.init_params(jax.random.PRNGKey(3), hp, "legacy")
    return hp, params


def test_eight_devices_available():
    assert jax.device_count() >= 8


@pytest.mark.parametrize(
    "n_dev,shape",
    [
        (2, (150, 90)),
        (4, (150, 90)),
        (8, (150, 90)),
        # H divisible by sub: the canvas tail holds real image rows — the
        # last device's input halo must carry them (regression: zeroing the
        # tail truncated the bottom margin of the image)
        (2, (144, 90)),
        (4, (168, 64)),
    ],
)
def test_halo_matches_single_device(model, rng, n_dev, shape):
    hp, params = model
    mesh = make_mesh(data=n_dev, model=1)
    image = rng.rand(*shape).astype(np.float32)
    mean, std = 0.3, 0.2

    single = InferenceEngine(hp, params, "legacy", mean, std).infer(image)

    canvas = halo.build_canvas(image, hp, n_dev)
    with mesh:
        probs = halo.spatial_infer(
            params, jnp.asarray(canvas), shape[0], shape[1], hp, "legacy",
            mesh, mean=mean, std=std,
        )
    got = np.moveaxis(np.asarray(probs), -1, 0)
    np.testing.assert_allclose(got, single, atol=2e-5)


def test_halo_under_jit(model, rng):
    """The whole spatially-sharded path compiles as one program."""
    hp, params = model
    mesh = make_mesh(data=4, model=1)
    image = rng.rand(150, 90).astype(np.float32)
    single = InferenceEngine(hp, params, "legacy", 0.3, 0.2).infer(image)
    canvas = halo.build_canvas(image, hp, 4)
    jit_fn = jax.jit(
        lambda p, c: halo.spatial_infer(
            p, c, 150, 90, hp, "legacy", mesh, mean=0.3, std=0.2
        )
    )
    with mesh:
        probs = jit_fn(params, jnp.asarray(canvas))
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(probs), -1, 0), single, atol=2e-5
    )


def test_halo_fewer_tile_rows_than_devices(model, rng):
    """Image with 1 tile row on an 8-device mesh: phantom bands masked."""
    hp, params = model
    mesh = make_mesh(data=8, model=1)
    image = rng.rand(20, 40).astype(np.float32)
    single = InferenceEngine(hp, params, "legacy", 0.0, 1.0).infer(image)
    canvas = halo.build_canvas(image, hp, 8)
    with mesh:
        probs = halo.spatial_infer(
            params, jnp.asarray(canvas), 20, 40, hp, "legacy", mesh,
            mean=0.0, std=1.0,
        )
    np.testing.assert_allclose(np.moveaxis(np.asarray(probs), -1, 0), single, atol=2e-5)


def test_dp_train_step_matches_single(model):
    """Batch-sharded training step == unsharded (same math, psum'd grads)."""
    hp, _ = model
    cfg = tr.TrainConfig.for_variant("legacy", seed=0)
    rng_np = np.random.RandomState(0)
    batch = {
        "image": rng_np.rand(8, 32, 32, 1).astype(np.float32),
        "labels": np.eye(3, dtype=np.float32)[
            rng_np.randint(0, 3, (8, 32, 32))
        ],
        "weights": np.ones((8, 32, 32, 3), np.float32),
    }
    key = jax.random.PRNGKey(0)

    t_single = tr.Trainer(hp, cfg, model_path="/tmp/nope")
    p1, o1, m1 = t_single.train_step(
        t_single.params, t_single.opt_state, batch, key
    )

    mesh = make_mesh(data=8, model=1)
    t_mesh = tr.Trainer(hp, cfg, model_path="/tmp/nope", mesh=mesh)
    sharded_batch = {
        k: jax.device_put(v, data_sharding(mesh)) for k, v in batch.items()
    }
    p2, o2, m2 = t_mesh.train_step(
        t_mesh.params, t_mesh.opt_state, sharded_batch, key
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_param_sharding():
    """Wide kernels spread over the model axis; narrow ones replicated."""
    hp = HParams(im_size=32, n_channels=1, n_classes=3, n_out0=64, ks=3, n_layers=2)
    params = unet.init_params(jax.random.PRNGKey(0), hp, "v2")
    mesh = make_mesh(data=2, model=4)
    specs = shard_params(params, mesh, tp_threshold=256)
    # bottom kernel out-channels = 64*4 = 256 -> sharded
    assert specs["bottom"]["kernel1"].spec == jax.sharding.PartitionSpec(
        None, None, None, "model"
    )
    assert specs["top"]["kernel"].spec == jax.sharding.PartitionSpec()
    sharded = put_params(params, mesh, tp_threshold=256)
    # forward still works under TP sharding
    x = jnp.ones((4, 32, 32, 1))
    y = unet.apply(sharded, x, hp, "v2")
    assert y.shape == (4, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-4)


def test_train_loss_decreases_synthetic(model, tmp_path):
    """Smoke-train on synthetic blobs; loss and error must drop."""
    hp, _ = model
    cfg = tr.TrainConfig.for_variant(
        "v2", n_aug=1, dataset_mean=0.5, dataset_std=0.3, seed=0,
        lr0=1e-3, ckpt_every=25,
    )
    rng_np = np.random.RandomState(0)

    def synth(n):
        imgs = np.zeros((n, 32, 32, 1, 1), np.float32)
        labels = np.zeros((n, 32, 32, 3), np.float32)
        for i in range(n):
            img = np.zeros((32, 32), np.float32)
            ant = np.ones((32, 32), np.int32)  # background=1
            r, c = rng_np.randint(8, 24, 2)
            rr, cc = np.ogrid[:32, :32]
            disk = (rr - r) ** 2 + (cc - c) ** 2 < 25
            ring = ((rr - r) ** 2 + (cc - c) ** 2 < 36) & ~disk
            img[disk] = 0.9
            img[ring] = 0.5
            ant[ring] = 2  # contours
            ant[disk] = 3  # nuclei
            imgs[i, :, :, 0, 0] = (img - cfg.dataset_mean) / cfg.dataset_std
            for k in range(3):
                labels[i, :, :, k] = ant == k + 1
        c = tr.Corpus.__new__(tr.Corpus)
        c.images, c.labels = imgs, labels
        c.weights = tr.class_weight_maps(labels, np.zeros((n, 32, 32), np.float32))
        c.n, c.cfg = n, cfg
        return c

    corpus = synth(16)
    trainer = tr.Trainer(hp, cfg, model_path=str(tmp_path / "m"), log_path=str(tmp_path / "log"))
    first_batch = next(corpus.batches(8, np.random.RandomState(1), False))
    e0 = float(trainer.eval_step(trainer.params, first_batch)["mean_error"])
    best = trainer.fit(corpus, corpus, n_steps=60, batch_size=8, verbose=False)
    e1 = float(trainer.eval_step(trainer.params, first_batch)["mean_error"])
    assert e1 < e0, (e0, e1)
    assert best < e0
    # checkpoint written and loadable
    from unmicst_tpu.core.checkpoint import load_native

    p, hp2, variant, mean, std, meta = load_native(str(tmp_path / "m" / "model.unmicst-tpu.msgpack"))
    assert hp2 == hp and variant == "v2"
    # sidecars are reference-compatible pickles
    from unmicst_tpu.core.hp import load_model_dir

    b = load_model_dir(str(tmp_path / "m"))
    assert b.hp == hp and b.has_native_ckpt


def test_build_canvas_channel_validation():
    # regression: channel-count mismatches used to zero-fill (2D stack
    # input under a multi-channel hp) or IndexError (too many planes)
    hp = HParams(
        im_size=32, n_channels=3, n_classes=3, n_out0=4, ks=3,
        n_extra_convs=0, n_layers=2, batch_size=8,
    )
    with pytest.raises(ValueError):
        halo.build_canvas(np.zeros((40, 40), np.float32), hp, 2,
                          channel_mode="stack")
    with pytest.raises(ValueError):
        halo.build_canvas(np.zeros((5, 40, 40), np.float32), hp, 2,
                          channel_mode="stack")
    with pytest.raises(ValueError):
        halo.build_canvas(np.zeros((2, 40, 40), np.float32), hp, 2,
                          channel_mode="broadcast")
    with pytest.raises(ValueError):
        halo.build_canvas(np.zeros((1, 1, 40, 40), np.float32), hp, 2)
    got = halo.build_canvas(np.ones((3, 40, 40), np.float32), hp, 2,
                            channel_mode="stack")
    assert got.shape[-1] == 3 and got.max() == 1.0
