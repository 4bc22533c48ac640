"""Full framework lifecycle: train -> save (native + TF1) -> zoo load -> CLI.

The "switch from the reference" journey end-to-end: a model trained by this
framework produces a model directory that (a) this framework's CLI consumes
by name, and (b) carries a Saver-compatible TF1 bundle the upstream tool
could restore.
"""


import numpy as np
import pytest

from unmicst_tpu import cli
from unmicst_tpu import train as tr
from unmicst_tpu.core.checkpoint import load_tf1_params
from unmicst_tpu.core.hp import HParams, load_model_dir
from unmicst_tpu.io.tiff import TiffWriter, imread, num_pages

pytestmark = pytest.mark.slow


def test_train_save_load_infer_cycle(tmp_path, rng):
    hp = HParams(
        im_size=32, n_channels=1, n_classes=3, n_out0=6, ks=3,
        n_extra_convs=0, n_layers=2, batch_size=8,
    )
    cfg = tr.TrainConfig.for_variant(
        "v2", n_aug=1, lr0=1e-3, ckpt_every=10,
        dataset_mean=0.5, dataset_std=0.3, seed=0,
    )

    # synthetic blob corpus on disk, reference layout
    data_dir = tmp_path / "corpus"
    data_dir.mkdir()
    for i in range(12):
        img = np.zeros((32, 32), np.float32)
        ant = np.ones((32, 32), np.uint8)
        r, c = rng.randint(8, 24, 2)
        rr, cc = np.ogrid[:32, :32]
        disk = (rr - r) ** 2 + (cc - c) ** 2 < 25
        ring = ((rr - r) ** 2 + (cc - c) ** 2 < 36) & ~disk
        img[disk], img[ring] = 0.9, 0.5
        ant[ring], ant[disk] = 2, 3
        with TiffWriter(str(data_dir / f"I{i:05d}_Img.tif"), bigtiff=False) as tw:
            tw.write((img * 65535).astype(np.uint16))
        with TiffWriter(str(data_dir / f"I{i:05d}_Ant.tif"), bigtiff=False) as tw:
            tw.write(ant)
        with TiffWriter(str(data_dir / f"I{i:05d}_wt.tif"), bigtiff=False) as tw:
            tw.write(np.zeros((32, 32), np.uint8))

    corpus = tr.Corpus(str(data_dir), 12, hp, cfg)
    zoo_root = tmp_path / "zoo"
    model_dir = zoo_root / "blobNet"
    trainer = tr.Trainer(hp, cfg, str(model_dir))
    trainer.fit(corpus, corpus, n_steps=40, verbose=False)
    trainer.save()

    # (a) dir is a complete reference-format model dir
    for f in [
        "hp.data", "datasetMean.data", "datasetStDev.data",
        "model.unmicst-tpu.msgpack", "model.ckpt.index",
        "model.ckpt.data-00000-of-00001", "checkpoint",
    ]:
        assert (model_dir / f).exists(), f

    # (b) the TF1 bundle restores through the TF1 path and matches native
    tf1_params = load_tf1_params(str(model_dir / "model.ckpt"), hp, "v2")
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, trainer.params)
        ),
        jax.tree_util.tree_leaves(tf1_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # (c) CLI consumes the trained model by name
    img_dir = tmp_path / "s" / "registration"
    img_dir.mkdir(parents=True)
    test_img = (rng.rand(80, 64) * 60000).astype(np.uint16)
    with TiffWriter(str(img_dir / "t.ome.tif"), bigtiff=False) as tw:
        tw.write(test_img)
    out = tmp_path / "out"
    rc = cli.main(
        [str(img_dir / "t.ome.tif"), "--tool", "unmicst-solo",
         "--model", "blobNet", "--modelRoot", str(zoo_root),
         "--outputPath", str(out), "--stackOutput"]
    )
    assert rc == 0
    prob = out / "t_Probabilities_1.tif"
    assert num_pages(str(prob)) == 3
    pages = [imread(str(prob), k).astype(int) for k in range(3)]
    assert np.abs(sum(pages) - 255).max() <= 3

    # (d) bundle loader prefers the native checkpoint
    bundle = load_model_dir(str(model_dir))
    assert bundle.has_native_ckpt and bundle.has_tf1_ckpt
