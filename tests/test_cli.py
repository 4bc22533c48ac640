"""CLI surface: flag parsing, stem parsing, output file contract."""

import os

import numpy as np
import pytest

from tests.conftest import REFERENCE, needs_reference
from unmicst_tpu import cli
from unmicst_tpu.io.tiff import imread, imwrite, num_pages


def test_parser_wrapper_surface():
    p = cli.build_parser()
    args = p.parse_args(
        ["img.ome.tif", "--tool", "unmicst-duo", "--channel", "2", "3",
         "--classOrder", "1", "2", "3", "--stackOutput", "--GPU", "1"]
    )
    assert args.channel == [2, 3]
    assert args.classOrder == [1, 2, 3]
    assert args.stackOutput


@pytest.mark.parametrize(
    "tool,fname,stem,ftype",
    [
        ("unmicst-solo", "a.ome.tif", "a", "ome.tif"),
        ("unmicst-solo", "a.b.ome.tiff", "a.b", "ome.tiff"),
        ("unmicst-solo", "x.tif", "x", "tif"),
        # legacy/duo split at the FIRST dot (UnMicst.py:603-605)
        ("unmicst-legacy", "a.b.tif", "a", "b.tif"),
        ("UnMicstCyto2", "x.ome.tif", "x", "ome.tif"),
    ],
)
def test_stem_parsing(tool, fname, stem, ftype):
    got_stem, got_type = cli.parse_stem(fname, tool)
    assert (got_stem, got_type) == (stem, ftype)


def test_solo_stem_requires_extension():
    with pytest.raises(ValueError):
        cli.parse_stem("noextension", "unmicst-solo")


def test_resolve_model_dir_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        cli.resolve_model_dir("nope", str(tmp_path))


@needs_reference
def test_cli_end_to_end_legacy(tmp_path, rng):
    """Full CLI run on a small crop: output naming + page contract."""
    # build an input in a nested dir (outputPath defaults to ../probability_maps)
    img_dir = tmp_path / "sample" / "registration"
    img_dir.mkdir(parents=True)
    crop = imread(
        os.path.join(REFERENCE, "UNet sample data/registration/105.tif")
    )[:192, :160]
    imwrite(str(img_dir / "crop.tif"), crop, bigtiff=False)

    out = tmp_path / "out"
    rc = cli.main(
        [str(img_dir / "crop.tif"), "--tool", "unmicst-legacy",
         "--outputPath", str(out), "--stackOutput", "--stats"]
    )
    assert rc == 0
    prob = out / "crop_Probabilities_1.tif"
    prev = out / "qc" / "crop_Preview_1.tif"
    assert prob.exists() and prev.exists()
    assert num_pages(str(prob)) == 3
    assert num_pages(str(prev)) == 2
    pages = [imread(str(prob), k) for k in range(3)]
    assert all(p.shape == crop.shape and p.dtype == np.uint8 for p in pages)
    # reversed class order: page0=nuclei(cls2), page2=background(cls0);
    # probabilities sum to ~255 per pixel
    total = sum(p.astype(int) for p in pages)
    assert np.abs(total - 255).max() <= 3

    # non-stack mode
    out2 = tmp_path / "out2"
    rc = cli.main(
        [str(img_dir / "crop.tif"), "--tool", "unmicst-legacy",
         "--outputPath", str(out2)]
    )
    assert rc == 0
    assert num_pages(str(out2 / "crop_ContoursPM_1.tif")) == 2
    assert num_pages(str(out2 / "crop_NucleiPM_1.tif")) == 1
    # contours plane identical across modes
    np.testing.assert_array_equal(
        imread(str(out2 / "crop_ContoursPM_1.tif"), 0),
        pages[1],
    )


def test_gpu_flag_pins_default_device(tmp_path, rng):
    """--GPU N routes through runtime.devices.select_device and pins the JAX
    default device (UnMicst.py:577-595 semantics; explicit index branch)."""
    import jax

    from unmicst_tpu.io.tiff import TiffWriter

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    img = (rng.rand(96, 96) * 60000).astype(np.uint16)
    src = tmp_path / "s" / "registration" / "img.tif"
    src.parent.mkdir(parents=True)
    with TiffWriter(str(src), bigtiff=False) as tw:
        tw.write(img)
    try:
        rc = cli.main(
            [str(src), "--tool", "unmicst-solo", "--model", "blobDemo",
             "--modelRoot", os.path.join(repo, "models"),
             "--outputPath", str(tmp_path / "out"), "--GPU", "3"]
        )
        assert rc == 0
        assert jax.config.jax_default_device == jax.devices()[3]
        # invalid index fails loudly, like CUDA_VISIBLE_DEVICES would
        with pytest.raises(ValueError, match="device 99"):
            cli.main(
                [str(src), "--tool", "unmicst-solo", "--model", "blobDemo",
                 "--modelRoot", os.path.join(repo, "models"),
                 "--outputPath", str(tmp_path / "out2"), "--GPU", "99"]
            )
    finally:
        jax.config.update("jax_default_device", None)


def test_cli_streaming_scaling_factor_matches_whole(tmp_path, rng):
    """--engine streaming --scalingFactor 0.5 == whole-image engine outputs
    (VERDICT r1 missing #5: off-scale slides previously fell back)."""
    from unmicst_tpu.io.tiff import TiffWriter

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    img = (rng.rand(180, 140) * 60000).astype(np.uint16)
    src = tmp_path / "s" / "registration" / "img.tif"
    src.parent.mkdir(parents=True)
    with TiffWriter(str(src), bigtiff=False) as tw:
        tw.write(img)
    common = [str(src), "--tool", "unmicst-solo", "--model", "blobDemo",
              "--modelRoot", os.path.join(repo, "models"),
              "--scalingFactor", "0.5", "--stackOutput"]
    assert cli.main(common + ["--outputPath", str(tmp_path / "whole"),
                              "--engine", "whole"]) == 0
    assert cli.main(common + ["--outputPath", str(tmp_path / "stream"),
                              "--engine", "streaming"]) == 0
    for k in range(3):
        a = imread(str(tmp_path / "whole" / "img_Probabilities_1.tif"), k)
        b = imread(str(tmp_path / "stream" / "img_Probabilities_1.tif"), k)
        assert a.shape == img.shape and b.shape == img.shape
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 2


@needs_reference
def test_cli_int8_precision_close_to_f32(tmp_path, rng):
    """--precision int8 on REAL legacy weights: the PTQ accuracy contract
    on weights the builder did not choose.  Max pixel diff is the wrong
    metric (class-boundary pixels near softmax 0.5 legitimately flip
    under any perturbation), so the contract is distributional: small
    mean, bounded p99, rare argmax changes.  Measured on this crop:
    mean 3.4 levels, p99 41, argmax disagreement 1.9% (BASELINE.md r3
    int8 section)."""
    img_dir = tmp_path / "sample" / "registration"
    img_dir.mkdir(parents=True)
    crop = imread(
        os.path.join(REFERENCE, "UNet sample data/registration/105.tif")
    )[:192, :160]
    imwrite(str(img_dir / "crop.tif"), crop, bigtiff=False)
    outs = {}
    for prec in ("float32", "int8"):
        out = tmp_path / prec
        rc = cli.main(
            [str(img_dir / "crop.tif"), "--tool", "unmicst-legacy",
             "--outputPath", str(out), "--stackOutput"]
            + (["--precision", prec] if prec != "float32" else [])
        )
        assert rc == 0
        outs[prec] = np.stack([
            imread(str(out / "crop_Probabilities_1.tif"), k).astype(int)
            for k in range(3)
        ])
    diff = np.abs(outs["int8"] - outs["float32"])
    assert diff.mean() < 6.0, diff.mean()
    assert np.percentile(diff, 99) <= 60, np.percentile(diff, 99)
    dis = (outs["int8"].argmax(0) != outs["float32"].argmax(0)).mean()
    assert dis < 0.04, dis


def test_cli_streaming_int8(tmp_path, rng):
    """--precision int8 through the streaming engine: same distributional
    contract as the whole-image int8 path (the per-slide calibration
    samples differ, so the comparison is vs streaming f32, not bit-exact)."""
    from unmicst_tpu.io.tiff import TiffWriter

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    img = (rng.rand(96, 80) * 60000).astype(np.uint16)
    src = tmp_path / "s" / "registration" / "img.tif"
    src.parent.mkdir(parents=True)
    with TiffWriter(str(src), bigtiff=False) as tw:
        tw.write(img)
    outs = {}
    for prec in ("float32", "int8"):
        out = tmp_path / prec
        rc = cli.main(
            [str(src), "--tool", "unmicst-solo", "--model", "blobDemo",
             "--modelRoot", os.path.join(repo, "models"),
             "--outputPath", str(out), "--stackOutput",
             "--engine", "streaming"]
            + (["--precision", prec] if prec != "float32" else [])
        )
        assert rc == 0
        outs[prec] = np.stack([
            imread(str(out / "img_Probabilities_1.tif"), k).astype(int)
            for k in range(3)
        ])
    diff = np.abs(outs["int8"] - outs["float32"])
    assert diff.mean() < 6.0, diff.mean()
    assert np.percentile(diff, 99) <= 60, np.percentile(diff, 99)
    dis = (outs["int8"].argmax(0) != outs["float32"].argmax(0)).mean()
    assert dis < 0.04, dis


def test_cli_zstd_tiff_input(tmp_path, rng):
    """A zstd-compressed (tag 50000) TIFF input — what tifffile-based
    pipelines write — drives the CLI end-to-end and matches the
    uncompressed-input outputs bit-exactly."""
    import zstandard

    from tests.test_tiff import _write_strip_tiff
    from unmicst_tpu.io.tiff import TiffWriter, imread

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    img = (rng.rand(96, 80) * 60000).astype(np.uint16)
    d = tmp_path / "s" / "registration"
    d.mkdir(parents=True)
    plain, zst = str(d / "plain.tif"), str(d / "zst.tif")
    with TiffWriter(plain, bigtiff=False) as tw:
        tw.write(img)
    _write_strip_tiff(
        zst, img, 50000,
        lambda b: zstandard.ZstdCompressor(level=3).compress(b),
        rows_per_strip=40,
    )
    base = ["--tool", "unmicst-solo", "--model", "blobDemo",
            "--modelRoot", os.path.join(repo, "models"), "--stackOutput"]
    assert cli.main([plain] + base + ["--outputPath", str(tmp_path / "a")]) == 0
    assert cli.main([zst] + base + ["--outputPath", str(tmp_path / "b")]) == 0
    a = imread(str(tmp_path / "a" / "plain_Probabilities_1.tif"))
    b = imread(str(tmp_path / "b" / "zst_Probabilities_1.tif"))
    np.testing.assert_array_equal(a, b)


def test_pyramid_output_flag(tmp_path, rng):
    """--pyramidOutput writes tiled SubIFD-pyramid pages with identical
    full-res pixels to the flat run."""
    from unmicst_tpu.io.tiff import TiffFile, TiffWriter

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    img = (rng.rand(600, 560) * 60000).astype(np.uint16)
    src = tmp_path / "s" / "registration" / "img.tif"
    src.parent.mkdir(parents=True)
    with TiffWriter(str(src), bigtiff=False) as tw:
        tw.write(img)
    base = [str(src), "--tool", "unmicst-solo", "--model", "blobDemo",
            "--modelRoot", os.path.join(repo, "models"), "--stackOutput"]
    assert cli.main(base + ["--outputPath", str(tmp_path / "p"),
                            "--pyramidOutput"]) == 0
    assert cli.main(base + ["--outputPath", str(tmp_path / "u")]) == 0
    with TiffFile(str(tmp_path / "p" / "img_Probabilities_1.tif")) as tp, \
            TiffFile(str(tmp_path / "u" / "img_Probabilities_1.tif")) as tu:
        assert len(tp.pages) == len(tu.pages) == 3
        for k in range(3):
            assert tp.pages[k].tiled
            assert tp.pages[k].subifds is not None
            np.testing.assert_array_equal(tp.read_page(k), tu.read_page(k))
            lv = tp.read_subifd(k, 0)
            assert lv.shape == (300, 280)


def test_compress_output_flag(tmp_path, rng):
    """--compressOutput writes Deflate pages the stack contract intact."""
    from unmicst_tpu.io.tiff import TiffFile, TiffWriter

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    img = (rng.rand(96, 80) * 60000).astype(np.uint16)
    src = tmp_path / "s" / "registration" / "img.tif"
    src.parent.mkdir(parents=True)
    with TiffWriter(str(src), bigtiff=False) as tw:
        tw.write(img)
    base = [str(src), "--tool", "unmicst-solo", "--model", "blobDemo",
            "--modelRoot", os.path.join(repo, "models"), "--stackOutput"]
    assert cli.main(base + ["--outputPath", str(tmp_path / "c"),
                            "--compressOutput"]) == 0
    assert cli.main(base + ["--outputPath", str(tmp_path / "u")]) == 0
    assert cli.main(base + ["--outputPath", str(tmp_path / "z"),
                            "--compressOutput", "zstd"]) == 0
    with TiffFile(str(tmp_path / "c" / "img_Probabilities_1.tif")) as tc, \
            TiffFile(str(tmp_path / "u" / "img_Probabilities_1.tif")) as tu, \
            TiffFile(str(tmp_path / "z" / "img_Probabilities_1.tif")) as tz:
        assert len(tc.pages) == len(tu.pages) == len(tz.pages) == 3
        for k in range(3):
            assert tc.pages[k].compression == 8
            assert tz.pages[k].compression == 50000
            np.testing.assert_array_equal(tc.read_page(k), tu.read_page(k))
            np.testing.assert_array_equal(tz.read_page(k), tu.read_page(k))


@needs_reference
def test_intensity_range_flag(tmp_path):
    """--intensityRange min,max reproduces the data-derived default
    bit-for-bit; a different range changes the maps; solo rejects the
    flag; malformed values are loud SystemExits."""
    img_dir = tmp_path / "s" / "registration"
    img_dir.mkdir(parents=True)
    crop = imread(
        os.path.join(REFERENCE, "UNet sample data/registration/105.tif")
    )[:160, :128]
    imwrite(str(img_dir / "c.tif"), crop, bigtiff=False)
    src = str(img_dir / "c.tif")
    base = [src, "--tool", "unmicst-legacy", "--stackOutput"]

    assert cli.main(base + ["--outputPath", str(tmp_path / "a")]) == 0
    lo, hi = float(crop.min()), float(crop.max())
    assert cli.main(
        base + ["--outputPath", str(tmp_path / "b"),
                "--intensityRange", f"{lo},{hi}"]
    ) == 0
    a = [imread(str(tmp_path / "a" / "c_Probabilities_1.tif"), k)
         for k in range(3)]
    b = [imread(str(tmp_path / "b" / "c_Probabilities_1.tif"), k)
         for k in range(3)]
    for pa, pb in zip(a, b):
        np.testing.assert_array_equal(pa, pb)
    # a wider pinned range shifts the normalization -> different maps
    assert cli.main(
        base + ["--outputPath", str(tmp_path / "w"),
                "--intensityRange", "0,65535"]
    ) == 0
    w = [imread(str(tmp_path / "w" / "c_Probabilities_1.tif"), k)
         for k in range(3)]
    assert any(not np.array_equal(pw, pa) for pw, pa in zip(w, a))

    # solo's net input is un-rescaled: the flag must fail loudly
    with pytest.raises(SystemExit, match="unmicst-solo"):
        cli.main([src, "--tool", "unmicst-solo", "--stackOutput",
                  "--outputPath", str(tmp_path / "x"),
                  "--intensityRange", "0,100"])
    # malformed pairs
    for bad in (["5"], ["9,9"], ["a,b"], ["0,1", "0,2"]):
        with pytest.raises(SystemExit, match="intensityRange"):
            cli.main(base + ["--outputPath", str(tmp_path / "y"),
                             "--intensityRange", *bad])


@needs_reference
def test_intensity_range_streaming_scaled(tmp_path):
    """Raw-unit --intensityRange over the SCALED streaming path (advisor
    r4 high): the pin must divide by the dtype full-scale before reaching
    the unit-scale ResampledSource, or every pixel clips to lo and the
    maps come out silently constant.  Pinned streamed == pinned whole at
    the same scale, and the maps are non-constant."""
    img_dir = tmp_path / "sample" / "registration"
    img_dir.mkdir(parents=True)
    crop = imread(
        os.path.join(REFERENCE, "UNet sample data/registration/105.tif")
    )[:192, :160]
    imwrite(str(img_dir / "c.tif"), crop, bigtiff=False)
    base = [str(img_dir / "c.tif"), "--tool", "unmicst-legacy",
            "--stackOutput", "--scalingFactor", "0.5",
            "--intensityRange", f"{float(crop.min())},{float(crop.max())}"]
    assert cli.main(base + ["--outputPath", str(tmp_path / "w"),
                            "--engine", "whole"]) == 0
    assert cli.main(base + ["--outputPath", str(tmp_path / "st"),
                            "--engine", "streaming"]) == 0
    for k in range(3):
        a = imread(str(tmp_path / "w" / "c_Probabilities_1.tif"), k)
        b = imread(str(tmp_path / "st" / "c_Probabilities_1.tif"), k)
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 2
        assert b.min() != b.max()  # the bug produced constant maps


@needs_reference
def test_intensity_range_flag_streaming(tmp_path):
    """The streaming engine honors --intensityRange: pinning the data's
    own (min, max) equals the derived run bit-for-bit."""
    img_dir = tmp_path / "s" / "registration"
    img_dir.mkdir(parents=True)
    crop = imread(
        os.path.join(REFERENCE, "UNet sample data/registration/105.tif")
    )[:160, :128]
    imwrite(str(img_dir / "c.tif"), crop, bigtiff=False)
    src = str(img_dir / "c.tif")
    base = [src, "--tool", "unmicst-legacy", "--stackOutput",
            "--engine", "streaming"]
    assert cli.main(base + ["--outputPath", str(tmp_path / "a")]) == 0
    lo, hi = float(crop.min()), float(crop.max())
    assert cli.main(
        base + ["--outputPath", str(tmp_path / "b"),
                "--intensityRange", f"{lo},{hi}"]
    ) == 0
    for k in range(3):
        np.testing.assert_array_equal(
            imread(str(tmp_path / "a" / "c_Probabilities_1.tif"), k),
            imread(str(tmp_path / "b" / "c_Probabilities_1.tif"), k),
        )


def test_cli_engine_sharded_matches_streaming(tmp_path, rng):
    """--engine sharded (stripes column-sharded over the 8-device CPU
    mesh, halo seams via ppermute) == --engine streaming within 1 uint8
    level, through the CLI surface; --meshShape subsets the devices;
    non-streamable inputs fail loudly."""
    import jax

    from unmicst_tpu.io.tiff import TiffWriter

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    img = (rng.rand(180, 220) * 250).astype(np.uint8)
    src = tmp_path / "s" / "registration" / "img.tif"
    src.parent.mkdir(parents=True)
    with TiffWriter(str(src), bigtiff=False) as tw:
        tw.write(img)
    common = [str(src), "--tool", "unmicst-solo", "--model", "blobDemo",
              "--modelRoot", os.path.join(repo, "models"), "--stackOutput"]
    assert cli.main(common + ["--outputPath", str(tmp_path / "stream"),
                              "--engine", "streaming"]) == 0
    assert cli.main(common + ["--outputPath", str(tmp_path / "shard"),
                              "--engine", "sharded"]) == 0
    assert cli.main(common + ["--outputPath", str(tmp_path / "shard4"),
                              "--engine", "sharded",
                              "--meshShape", "4"]) == 0
    for k in range(3):
        a = imread(str(tmp_path / "stream" / "img_Probabilities_1.tif"), k)
        b = imread(str(tmp_path / "shard" / "img_Probabilities_1.tif"), k)
        c = imread(str(tmp_path / "shard4" / "img_Probabilities_1.tif"), k)
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
        assert np.abs(a.astype(int) - c.astype(int)).max() <= 1
    # the streamability gate applies: int16 solo input must refuse
    # sharded (rescale-free streaming needs a known uint8/uint16
    # im2double scale; float32 is fine — the source parity-casts it)
    fsrc = tmp_path / "s" / "registration" / "f.tif"
    with TiffWriter(str(fsrc), bigtiff=False) as tw:
        tw.write((rng.rand(64, 64) * 30000 - 15000).astype(np.int16))
    with pytest.raises(SystemExit, match="sharded"):
        cli.main([str(fsrc), "--tool", "unmicst-solo", "--model",
                  "blobDemo", "--modelRoot", os.path.join(repo, "models"),
                  "--outputPath", str(tmp_path / "x"),
                  "--engine", "sharded"])


def test_cli_engine_sharded_duo_and_pinned_range(tmp_path, rng):
    """Duo through --engine sharded: per-channel sharded streaming ==
    single-device streaming; --intensityRange pins compose (the sharded
    kernel normalizes with the pinned range, not per-band stats)."""
    import jax

    from tests.test_cli_variants import _make_model_dir
    from unmicst_tpu.core.hp import HParams
    from unmicst_tpu.io.tiff import TiffWriter

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    zoo = tmp_path / "zoo"
    zoo.mkdir()
    _make_model_dir(
        str(zoo), "duoDemo",
        HParams(im_size=32, n_channels=2, n_classes=3, n_out0=4, ks=3,
                n_layers=2),
        "duo",
    )
    src = tmp_path / "s" / "registration" / "d.tif"
    src.parent.mkdir(parents=True)
    planes = (rng.rand(2, 150, 170) * 60000).astype(np.uint16)
    with TiffWriter(str(src), bigtiff=False) as tw:
        tw.write(planes[0])
        tw.write(planes[1])
    common = [str(src), "--tool", "unmicst-duo", "--model", "duoDemo",
              "--modelRoot", str(zoo), "--channel", "1", "2",
              "--stackOutput",
              "--intensityRange", "0,65535", "--intensityRange", "10,50000"]
    assert cli.main(common + ["--outputPath", str(tmp_path / "stream"),
                              "--engine", "streaming"]) == 0
    assert cli.main(common + ["--outputPath", str(tmp_path / "shard"),
                              "--engine", "sharded"]) == 0
    for k in range(3):
        a = imread(str(tmp_path / "stream" / "d_Probabilities_1.tif"), k)
        b = imread(str(tmp_path / "shard" / "d_Probabilities_1.tif"), k)
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_use_pyramid_input(tmp_path, rng, monkeypatch):
    """--usePyramid at scale <= 0.5 decodes the nearest stored SubIFD
    level (the full-res plane is NEVER decoded) and equals feeding that
    level directly with the residual scale, upscaled to raw dims; the
    flag is a loud no-op on flat inputs."""
    import unmicst_tpu.io.tiff as tiff_mod
    from unmicst_tpu.io import preprocess as pp
    from unmicst_tpu.io.tiff import TiffFile, TiffWriter

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    img = (rng.rand(256, 384) * 60000).astype(np.uint16)
    src = tmp_path / "s" / "registration" / "pyr.tif"
    src.parent.mkdir(parents=True)
    with TiffWriter(str(src), bigtiff=False) as tw:
        n = tw.write_pyramid(img, tile=(64, 64), min_size=64)
    assert n == 2  # 1/2 and 1/4 stored levels
    with TiffFile(str(src)) as tf:
        lvl0 = tf.read_subifd(0, 0)
    assert lvl0.shape == (128, 192)
    lv = tmp_path / "s" / "registration" / "lvl.tif"
    with TiffWriter(str(lv), bigtiff=False) as tw:
        tw.write(lvl0)

    common = ["--tool", "unmicst-solo", "--model", "blobDemo",
              "--modelRoot", os.path.join(repo, "models"), "--stackOutput"]
    reads = []
    orig = tiff_mod.TiffFile.read_page

    def counting(self, i):
        reads.append(self.path)
        return orig(self, i)

    monkeypatch.setattr(tiff_mod.TiffFile, "read_page", counting)
    assert cli.main([str(src), *common, "--outputPath",
                     str(tmp_path / "p"), "--scalingFactor", "0.5",
                     "--usePyramid"]) == 0
    assert str(src) not in reads  # decode-bytes saving: no full decode

    # == the stored level fed directly at the residual scale (1.0 here)
    assert cli.main([str(lv), *common, "--outputPath",
                     str(tmp_path / "l")]) == 0
    for k in range(3):
        a = imread(str(tmp_path / "p" / "pyr_Probabilities_1.tif"), k)
        b = imread(str(tmp_path / "l" / "lvl_Probabilities_1.tif"), k)
        np.testing.assert_array_equal(a, pp.upscale_pm(b, img.shape))

    # non-octave scale: level 1/2 + residual device resize 0.6
    assert cli.main([str(src), *common, "--outputPath",
                     str(tmp_path / "p3"), "--scalingFactor", "0.3",
                     "--usePyramid"]) == 0
    assert cli.main([str(lv), *common, "--outputPath",
                     str(tmp_path / "l3"), "--scalingFactor", "0.6"]) == 0
    for k in range(3):
        a = imread(str(tmp_path / "p3" / "pyr_Probabilities_1.tif"), k)
        b = imread(str(tmp_path / "l3" / "lvl_Probabilities_1.tif"), k)
        np.testing.assert_array_equal(a, pp.upscale_pm(b, img.shape))

    # flat input: flag degrades loudly to the normal full-res read
    flat = tmp_path / "s" / "registration" / "flat.tif"
    with TiffWriter(str(flat), bigtiff=False) as tw:
        tw.write(img)
    assert cli.main([str(flat), *common, "--outputPath",
                     str(tmp_path / "f"), "--scalingFactor", "0.5",
                     "--usePyramid"]) == 0
    # explicit streaming engines refuse the combination
    with pytest.raises(SystemExit, match="usePyramid"):
        cli.main([str(src), *common, "--outputPath", str(tmp_path / "x"),
                  "--scalingFactor", "0.5", "--usePyramid",
                  "--engine", "streaming"])
