"""CLI end-to-end for duo/cyto2/solo via synthetic native-format model dirs."""

import os

import jax
import numpy as np
import pytest

from unmicst_tpu import cli
from unmicst_tpu.core import unet
from unmicst_tpu.core.checkpoint import save_native
from unmicst_tpu.core.hp import HParams, save_pickle
from unmicst_tpu.io.tiff import TiffWriter, imread, num_pages


def _make_model_dir(root, name, hp, variant):
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    params = unet.init_params(jax.random.PRNGKey(1), hp, variant)
    params = jax.tree_util.tree_map(np.asarray, params)
    save_native(
        os.path.join(d, "model.unmicst-tpu.msgpack"), params, hp, variant,
        0.25, 0.18,
    )
    save_pickle(hp.to_ref_dict(), os.path.join(d, "hp.data"))
    save_pickle(0.25, os.path.join(d, "datasetMean.data"))
    save_pickle(0.18, os.path.join(d, "datasetStDev.data"))
    return d


@pytest.fixture(scope="module")
def zoo(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("zoo"))
    _make_model_dir(
        root, "duoTest",
        HParams(im_size=32, n_channels=2, n_classes=3, n_out0=4, ks=3, n_layers=2),
        "duo",
    )
    _make_model_dir(
        root, "cytoTest",
        HParams(im_size=32, n_channels=1, n_classes=2, n_out0=4, ks=3, n_layers=1),
        "cyto2",
    )
    _make_model_dir(
        root, "soloTest",
        HParams(im_size=32, n_channels=1, n_classes=3, n_out0=4, ks=3, n_layers=2),
        "v2",
    )
    return root


def _write_stack(path, n_pages, rng, shape=(96, 80)):
    with TiffWriter(path, bigtiff=False) as tw:
        for _ in range(n_pages):
            tw.write((rng.rand(*shape) * 60000).astype(np.uint16))


def test_duo_two_channels(zoo, tmp_path, rng):
    img = tmp_path / "s" / "registration" / "multi.ome.tif"
    img.parent.mkdir(parents=True)
    _write_stack(str(img), 3, rng)
    out = tmp_path / "out"
    rc = cli.main(
        [str(img), "--tool", "unmicst-duo", "--model", "duoTest",
         "--modelRoot", zoo, "--channel", "1", "3",
         "--outputPath", str(out), "--stackOutput"]
    )
    assert rc == 0
    # duo stem splits at the first dot -> "multi"
    prob = out / "multi_Probabilities_1.tif"
    assert num_pages(str(prob)) == 3
    assert (out / "qc" / "multi_Preview_1.tif").exists()
    # channel order must matter (distinct planes feed distinct net channels)
    out2 = tmp_path / "out2"
    cli.main(
        [str(img), "--tool", "unmicst-duo", "--model", "duoTest",
         "--modelRoot", zoo, "--channel", "3", "1",
         "--outputPath", str(out2), "--stackOutput"]
    )
    a = imread(str(prob), 0)
    # the filename suffix is the first channel given (1-based): 3 here
    b = imread(str(out2 / "multi_Probabilities_3.tif"), 0)
    assert not np.array_equal(a, b)


def test_duo_scale_device_vs_host(zoo, tmp_path, rng):
    """The duo CLI at --scalingFactor 0.5 rides the device stack path;
    it must agree with the host float path (--check-numerics pins it)
    within 1 uint8 level."""
    img = tmp_path / "s" / "registration" / "m.ome.tif"
    img.parent.mkdir(parents=True)
    _write_stack(str(img), 2, rng)
    base = [str(img), "--tool", "unmicst-duo", "--model", "duoTest",
            "--modelRoot", zoo, "--channel", "1", "2", "--stackOutput",
            "--scalingFactor", "0.5"]
    out_d, out_h = tmp_path / "d", tmp_path / "h"
    assert cli.main(base + ["--outputPath", str(out_d)]) == 0
    assert cli.main(base + ["--outputPath", str(out_h),
                            "--check-numerics"]) == 0
    for k in range(3):
        a = imread(str(out_d / "m_Probabilities_1.tif"), k).astype(int)
        b = imread(str(out_h / "m_Probabilities_1.tif"), k).astype(int)
        d = np.abs(a - b)
        assert d.max() <= 1 and (d > 0).mean() < 0.02, (k, d.max())


def test_duo_single_channel_duplicates(zoo, tmp_path, rng):
    img = tmp_path / "s" / "registration" / "x.tif"
    img.parent.mkdir(parents=True)
    _write_stack(str(img), 1, rng)
    rc = cli.main(
        [str(img), "--tool", "unmicst-duo", "--model", "duoTest",
         "--modelRoot", zoo, "--outputPath", str(tmp_path / "o"),
         "--stackOutput"]
    )
    assert rc == 0  # one channel given -> duplicated (UnMicst2.py:748-751)


def test_cyto2_naming_contract(zoo, tmp_path, rng):
    img = tmp_path / "s" / "registration" / "c.ome.tif"
    img.parent.mkdir(parents=True)
    _write_stack(str(img), 2, rng)
    out = tmp_path / "out"
    rc = cli.main(
        [str(img), "--tool", "UnMicstCyto2", "--model", "cytoTest",
         "--modelRoot", zoo, "--channel", "2", "--outputPath", str(out),
         "--stackOutput"]
    )
    assert rc == 0
    # cyto2: 0-based channel suffix (wrapper passes channel 2 -> internal 1),
    # Preview NOT under qc/ (UnMicstCyto2.py output block)
    assert num_pages(str(out / "c_Probabilities_1.tif")) == 2
    assert (out / "c_Preview_1.tif").exists()
    assert not (out / "qc").exists()


def test_cyto2_nonstack_two_classes_errors(zoo, tmp_path, rng):
    img = tmp_path / "s" / "registration" / "c.tif"
    img.parent.mkdir(parents=True)
    _write_stack(str(img), 1, rng)
    with pytest.raises(SystemExit):
        cli.main(
            [str(img), "--tool", "UnMicstCyto2", "--model", "cytoTest",
             "--modelRoot", zoo, "--outputPath", str(tmp_path / "o")]
        )


def test_duo_streaming_nonstack_planes(zoo, tmp_path, rng):
    """Regression: duo streaming non-stack must write the contour/nuclei
    planes, not the first two fetched indexes."""
    img = tmp_path / "s" / "registration" / "d.ome.tif"
    img.parent.mkdir(parents=True)
    _write_stack(str(img), 2, rng, shape=(128, 96))
    out_whole, out_stream = tmp_path / "w", tmp_path / "st"
    base = [str(img), "--tool", "unmicst-duo", "--model", "duoTest",
            "--modelRoot", zoo, "--channel", "1", "2"]
    assert cli.main(base + ["--outputPath", str(out_whole),
                            "--engine", "whole"]) == 0
    assert cli.main(base + ["--outputPath", str(out_stream),
                            "--engine", "streaming"]) == 0
    for kind in ["ContoursPM", "NucleiPM"]:
        a = imread(str(out_whole / f"d_{kind}_1.tif"), 0).astype(int)
        b = imread(str(out_stream / f"d_{kind}_1.tif"), 0).astype(int)
        assert np.abs(a - b).max() <= 1, kind


def test_solo_ome_stem_and_classorder(zoo, tmp_path, rng):
    img = tmp_path / "s" / "registration" / "a.b.ome.tif"
    img.parent.mkdir(parents=True)
    _write_stack(str(img), 1, rng)
    out = tmp_path / "out"
    rc = cli.main(
        [str(img), "--tool", "unmicst-solo", "--model", "soloTest",
         "--modelRoot", zoo, "--outputPath", str(out), "--stackOutput",
         "--classOrder", "1", "2", "3"]
    )
    assert rc == 0
    assert num_pages(str(out / "a.b_Probabilities_1.tif")) == 3


def test_cyto2_streaming_shared_stats_matches_whole(zoo, tmp_path, rng):
    """Single-channel non-solo streaming at scale 1 threads the shared
    histogram stats into the engine (stats= scalar path) — equality with
    the whole-image engine pins it."""
    img = tmp_path / "s" / "registration" / "c.ome.tif"
    img.parent.mkdir(parents=True)
    _write_stack(str(img), 1, rng, shape=(140, 90))
    base = [str(img), "--tool", "UnMicstCyto2", "--model", "cytoTest",
            "--modelRoot", zoo, "--stackOutput", "--outlier", "99.0"]
    assert cli.main(base + ["--outputPath", str(tmp_path / "w"),
                            "--engine", "whole"]) == 0
    assert cli.main(base + ["--outputPath", str(tmp_path / "st"),
                            "--engine", "streaming"]) == 0
    for k in range(2):
        a = imread(str(tmp_path / "w" / "c_Probabilities_0.tif"), k).astype(int)
        b = imread(str(tmp_path / "st" / "c_Probabilities_0.tif"), k).astype(int)
        assert np.abs(a - b).max() <= 1


def test_cyto2_float32_input_not_parity_cast(zoo, tmp_path, rng):
    """UnMicstCyto2.py alone has NO float32->uint16 cast: a [0,1] float
    slide must flow through untruncated (casting would zero every pixel
    and produce a constant map).  Solo/legacy/duo keep the cast
    (UnMicst1-5.py:807-808)."""
    from unmicst_tpu.io import preprocess as pp
    from unmicst_tpu.io.tiff import TiffWriter, imread

    f = rng.rand(48, 48).astype(np.float32)  # unit floats
    # unit check: the per-tool switch behaves as documented
    cast = pp.preprocess_channel(f, 1.0, -1)
    nocast = pp.preprocess_channel(f, 1.0, -1, cast_float32=False)
    assert float(cast.net_input.std()) == 0.0  # truncated to zeros (quirk)
    assert float(nocast.net_input.std()) > 0.05

    # CLI end-to-end: cyto on float32 produces a NON-constant map
    img = tmp_path / "s" / "registration" / "f.tif"
    img.parent.mkdir(parents=True)
    with TiffWriter(str(img), bigtiff=False) as tw:
        tw.write(f)
    out = tmp_path / "outf"
    rc = cli.main(
        [str(img), "--tool", "UnMicstCyto2", "--model", "cytoTest",
         "--modelRoot", zoo, "--outputPath", str(out), "--stackOutput"]
    )
    assert rc == 0
    pm = imread(str(out / "f_Probabilities_0.tif"), 0)
    assert pm.max() > pm.min()
