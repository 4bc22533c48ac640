"""Batch sweep: discovery globs, resume cursor, shard split, deploy."""

import os

import numpy as np
import pytest

from tests.conftest import REFERENCE, needs_reference
from unmicst_tpu import batch
from unmicst_tpu.io.tiff import imread, imwrite, num_pages


def _make_tree(tmp_path, tma=False):
    slides = []
    for name in ["exemplar-001", "exemplar-002"]:
        sub = "dearray" if tma else "registration"
        d = tmp_path / name / sub
        d.mkdir(parents=True)
        fname = "core1.tif" if tma else "slide.ome.tif"
        img = (np.random.RandomState(len(slides)).rand(96, 80) * 60000).astype(
            np.uint16
        )
        imwrite(str(d / fname), img, bigtiff=False)
        if tma:
            imwrite(str(d / "TMA_MAP.tif"), img, bigtiff=False)  # excluded
        slides.append(str(d / fname))
    (tmp_path / "not-a-sample").mkdir()
    return slides


def test_discovery_registration(tmp_path):
    slides = _make_tree(tmp_path)
    assert batch.discover_slides(str(tmp_path)) == slides


def test_discovery_tma_excludes_map(tmp_path):
    slides = _make_tree(tmp_path, tma=True)
    found = batch.discover_slides(str(tmp_path), tma=True)
    assert found == slides
    assert not any("TMA_MAP" in s for s in found)


@needs_reference
def test_sweep_resume_and_outputs(tmp_path):
    slides = _make_tree(tmp_path)
    model_dir = os.path.join(REFERENCE, "models/nucleiDAPI")
    rep = batch.run_sweep(slides, model_dir, verbose=False)
    assert rep.completed == slides and not rep.failed
    for s in slides:
        out = os.path.join(os.path.dirname(os.path.dirname(s)), "prob_maps")
        # 2 pages: [contours PM, normalized raw] (batchUnMicst.py:575-580)
        assert num_pages(os.path.join(out, "slide_ContoursPM_1.tif")) == 2
        assert os.path.exists(os.path.join(out, "slide_NucleiPM_1.tif"))
    # resume: nothing re-runs
    rep2 = batch.run_sweep(slides, model_dir, verbose=False)
    assert rep2.skipped == slides and not rep2.completed


@needs_reference
def test_sweep_sharding(tmp_path):
    slides = _make_tree(tmp_path)
    model_dir = os.path.join(REFERENCE, "models/nucleiDAPI")
    r0 = batch.run_sweep(
        slides, model_dir, shard_index=0, num_shards=2, verbose=False
    )
    r1 = batch.run_sweep(
        slides, model_dir, shard_index=1, num_shards=2, verbose=False
    )
    assert sorted(r0.completed + r1.completed) == sorted(slides)
    assert len(r0.completed) == len(r1.completed) == 1


@needs_reference
def test_sweep_records_failures(tmp_path):
    d = tmp_path / "exemplar-001" / "registration"
    d.mkdir(parents=True)
    bad = d / "bad.ome.tif"
    bad.write_bytes(b"not a tiff at all")
    model_dir = os.path.join(REFERENCE, "models/nucleiDAPI")
    rep = batch.run_sweep([str(bad)], model_dir, verbose=False)
    assert rep.failed == [str(bad)] and not rep.completed


@needs_reference
def test_deploy_folder(tmp_path):
    im_dir = tmp_path / "corpus"
    im_dir.mkdir()
    for i in range(3):
        img = (np.random.RandomState(i).rand(128, 128) * 60000).astype(np.uint16)
        imwrite(str(im_dir / f"I{i:05d}_Img.tif"), img, bigtiff=False)
    pm_dir = tmp_path / "pm"
    batch.deploy_folder(
        str(im_dir), 3, os.path.join(REFERENCE, "models/nucleiDAPI"), str(pm_dir)
    )
    for i in range(1, 4):
        assert (pm_dir / f"I{i:05d}_Im.png").exists()
        assert (pm_dir / f"I{i:05d}_PM.png").exists()


def test_batch_device_path_matches_host_path(tmp_path, rng):
    """The scale-1 device-side path (infer_slide) == the host-preprocess
    path (preprocess_channel + infer + postprocess) within 1 uint8 level."""
    import jax

    from unmicst_tpu.core import unet
    from unmicst_tpu.core.hp import HParams
    from unmicst_tpu.infer import InferenceEngine
    from unmicst_tpu.io import preprocess as pp

    hp = HParams(im_size=32, n_channels=1, n_classes=3, n_out0=6, ks=3,
                 n_extra_convs=0, n_layers=2, batch_size=8, std_dev0=0.5)
    params = unet.init_params(jax.random.PRNGKey(2), hp, "legacy")
    eng = InferenceEngine(hp, params, "legacy", 0.3, 0.2)
    raw = (rng.rand(130, 90) * 60000).astype(np.uint16)
    dev_c, dev_n = eng.infer_slide(raw, classes=(1, 2))
    pc = pp.preprocess_channel(raw, 1.0, -1)
    probs = eng.infer(pc.net_input.astype(np.float32))
    host_c = pp.postprocess_pm(probs[1], pc.raw_shape)
    host_n = pp.postprocess_pm(probs[2], pc.raw_shape)
    assert np.abs(dev_c.astype(int) - host_c.astype(int)).max() <= 1
    assert np.abs(dev_n.astype(int) - host_n.astype(int)).max() <= 1


def test_sweep_streams_large_slides(tmp_path, rng):
    """stream_above_px forces the bounded-memory path; outputs match the
    whole-image sweep within 1 uint8 level and the cursor still records."""
    import jax

    from unmicst_tpu import batch
    from unmicst_tpu.core import unet
    from unmicst_tpu.core.hp import HParams, save_pickle
    from unmicst_tpu.core.checkpoint import save_native
    from unmicst_tpu.io.tiff import imread, imwrite

    hp = HParams(im_size=32, n_channels=1, n_classes=3, n_out0=6, ks=3,
                 n_extra_convs=0, n_layers=2, batch_size=8, std_dev0=0.5)
    params = unet.init_params(jax.random.PRNGKey(2), hp, "legacy")
    mdir = tmp_path / "model"
    mdir.mkdir()
    save_native(str(mdir / "model.unmicst-tpu.msgpack"), params, hp,
                "legacy", 0.3, 0.2)
    save_pickle(hp.to_ref_dict(), str(mdir / "hp.data"))
    save_pickle(0.3, str(mdir / "datasetMean.data"))
    save_pickle(0.2, str(mdir / "datasetStDev.data"))

    reg = tmp_path / "exemplar-1" / "registration"
    reg.mkdir(parents=True)
    raw = (rng.rand(140, 100) * 60000).astype(np.uint16)
    imwrite(str(reg / "a.ome.tif"), raw, bigtiff=False)

    slides = batch.discover_slides(str(tmp_path))
    assert slides
    out_a = tmp_path / "out_whole"
    out_b = tmp_path / "out_stream"
    rep_a = batch.run_sweep(slides, str(mdir), str(out_a), resume=False)
    rep_b = batch.run_sweep(slides, str(mdir), str(out_b), resume=False,
                            stream_above_px=1)
    assert rep_a.completed and rep_b.completed and not rep_b.failed
    for name in ("a_ContoursPM_1.tif", "a_NucleiPM_1.tif"):
        x = imread(str(out_a / name))
        y = imread(str(out_b / name))
        assert np.abs(x.astype(int) - y.astype(int)).max() <= 1
    # resumable: second run skips
    rep_c = batch.run_sweep(slides, str(mdir), str(out_b),
                            stream_above_px=1)
    assert rep_c.skipped == slides


@needs_reference
def test_shard_index_validated():
    model_dir = os.path.join(REFERENCE, "models", "nucleiDAPI")
    with pytest.raises(ValueError, match="shard_index"):
        batch.run_sweep([], model_dir, shard_index=4, num_shards=4)
    with pytest.raises(ValueError, match="shard_index"):
        batch.run_sweep([], model_dir, shard_index=-1, num_shards=2)


@needs_reference
def test_sweep_pinned_intensity_range(tmp_path):
    """in_range pins ONE rescale range across the whole sweep: pinning
    each slide's own (min, max) reproduces the derived run bit-for-bit,
    and one shared range yields sweep-consistent normalization (the TMA
    use case); malformed CLI values are loud."""
    from unmicst_tpu.io.tiff import imread

    slides = _make_tree(tmp_path)
    model_dir = os.path.join(REFERENCE, "models/nucleiDAPI")
    rep = batch.run_sweep(
        [slides[0]], model_dir, str(tmp_path / "derived"), verbose=False,
        resume=False,
    )
    assert not rep.failed
    img0 = imread(slides[0])
    rep2 = batch.run_sweep(
        [slides[0]], model_dir, str(tmp_path / "pinned"), verbose=False,
        resume=False, in_range=(float(img0.min()), float(img0.max())),
    )
    assert not rep2.failed
    np.testing.assert_array_equal(
        imread(str(tmp_path / "pinned" / "slide_NucleiPM_1.tif")),
        imread(str(tmp_path / "derived" / "slide_NucleiPM_1.tif")),
    )
    # CLI surface: parse + loud failures
    with pytest.raises(SystemExit, match="intensityRange"):
        batch.batch_main([str(tmp_path), "--intensityRange", "nope"])
    with pytest.raises(SystemExit, match="intensityRange"):
        batch.batch_main([str(tmp_path), "--intensityRange", "5"])


@needs_reference
def test_sweep_pinned_range_scaled_stream(tmp_path):
    """Pinned in_range composes with scaling_factor on the STREAMED sweep
    path (advisor r4 high): raw-unit pins convert to the virtual resized
    source's img_as_float units; streamed == whole within the resize
    tolerance, and maps are non-constant (the bug clipped all to lo)."""
    slides = _make_tree(tmp_path)
    model_dir = os.path.join(REFERENCE, "models/nucleiDAPI")
    img0 = imread(slides[0])
    pin = (float(img0.min()), float(img0.max()))
    rep_w = batch.run_sweep(
        [slides[0]], model_dir, str(tmp_path / "w"), resume=False,
        verbose=False, scaling_factor=0.5, in_range=pin,
    )
    rep_s = batch.run_sweep(
        [slides[0]], model_dir, str(tmp_path / "st"), resume=False,
        verbose=False, scaling_factor=0.5, in_range=pin,
        stream_above_px=1,
    )
    assert not rep_w.failed and not rep_s.failed
    for name in ("slide_NucleiPM_1.tif", "slide_ContoursPM_1.tif"):
        x = imread(str(tmp_path / "w" / name))
        y = imread(str(tmp_path / "st" / name))
        assert np.abs(x.astype(int) - y.astype(int)).max() <= 2
        assert y.min() != y.max()


@needs_reference
def test_sweep_channel_name(tmp_path, rng):
    """channel_name resolves per slide (different channel orders across
    files land on the right plane each time); a slide without the name
    fails individually while the sweep continues."""
    from unmicst_tpu.io.tiff import TiffWriter, imread

    def ome(names, z=1):
        chans = "".join(
            f'<Channel ID="Channel:0:{i}" Name="{n}"/>'
            for i, n in enumerate(names)
        )
        return (
            '<?xml version="1.0"?>'
            '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
            '<Image ID="Image:0"><Pixels ID="Pixels:0" '
            f'DimensionOrder="XYCZT" SizeC="{len(names)}" SizeZ="{z}" '
            'SizeT="1" SizeX="80" SizeY="96" Type="uint16">'
            f"{chans}</Pixels></Image></OME>"
        )

    target = (rng.rand(96, 80) * 60000).astype(np.uint16)
    junk = np.zeros_like(target)
    slides = []
    # slide 1: DNA is channel 0; slide 2: DNA is channel 1; slide 3: no DNA
    for name, planes, names in [
        ("exemplar-001", [target, junk], ["DNA", "other"]),
        ("exemplar-002", [junk, target], ["other", "DNA"]),
        ("exemplar-003", [junk], ["other"]),
    ]:
        d = tmp_path / name / "registration"
        d.mkdir(parents=True)
        p = str(d / "s.ome.tif")
        with TiffWriter(p, bigtiff=False) as tw:
            for i, pl in enumerate(planes):
                tw.write(pl, description=ome(names) if i == 0 else None)
        slides.append(p)

    model_dir = os.path.join(REFERENCE, "models/nucleiDAPI")
    rep = batch.run_sweep(slides, model_dir, verbose=False,
                          channel_name="DNA")
    assert sorted(rep.completed) == sorted(slides[:2])
    assert rep.failed == [slides[2]]
    # both completed slides produced the SAME maps (same pixels), with
    # the resolved per-slide index in the suffix
    a = imread(str(tmp_path / "exemplar-001" / "prob_maps"
                   / "s_NucleiPM_1.tif"))
    b = imread(str(tmp_path / "exemplar-002" / "prob_maps"
                   / "s_NucleiPM_2.tif"))
    np.testing.assert_array_equal(a, b)


def test_sweep_sharded_mesh_matches_single(tmp_path, rng):
    """run_sweep(mesh=...) column-shards every streamable slide over the
    8-device mesh; outputs match the single-device sweep within 1 uint8
    level (the batch_main --engine sharded surface)."""
    import jax

    from unmicst_tpu import batch
    from unmicst_tpu.core import unet
    from unmicst_tpu.core.checkpoint import save_native
    from unmicst_tpu.core.hp import HParams, save_pickle
    from unmicst_tpu.io.tiff import imread, imwrite
    from unmicst_tpu.runtime.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    hp = HParams(im_size=32, n_channels=1, n_classes=3, n_out0=6, ks=3,
                 n_extra_convs=0, n_layers=2, batch_size=8, std_dev0=0.5)
    params = unet.init_params(jax.random.PRNGKey(2), hp, "legacy")
    mdir = tmp_path / "model"
    mdir.mkdir()
    save_native(str(mdir / "model.unmicst-tpu.msgpack"), params, hp,
                "legacy", 0.3, 0.2)
    save_pickle(hp.to_ref_dict(), str(mdir / "hp.data"))
    save_pickle(0.3, str(mdir / "datasetMean.data"))
    save_pickle(0.2, str(mdir / "datasetStDev.data"))
    reg = tmp_path / "exemplar-1" / "registration"
    reg.mkdir(parents=True)
    imwrite(str(reg / "a.ome.tif"),
            (rng.rand(150, 180) * 60000).astype(np.uint16), bigtiff=False)

    slides = batch.discover_slides(str(tmp_path))
    out_a, out_b = tmp_path / "out_single", tmp_path / "out_mesh"
    rep_a = batch.run_sweep(slides, str(mdir), str(out_a), resume=False)
    rep_b = batch.run_sweep(slides, str(mdir), str(out_b), resume=False,
                            mesh=make_mesh(data=8, model=1))
    assert rep_a.completed and rep_b.completed and not rep_b.failed
    for name in ("a_ContoursPM_1.tif", "a_NucleiPM_1.tif"):
        x = imread(str(out_a / name))
        y = imread(str(out_b / name))
        assert np.abs(x.astype(int) - y.astype(int)).max() <= 1


@needs_reference
def test_sweep_use_pyramid(tmp_path, rng, monkeypatch):
    """use_pyramid at scale <= 0.5 sweeps from stored SubIFD levels
    (full-res pages never decoded), == the level run directly upscaled
    to full dims; flat slides fall through to the normal scaled path."""
    import unmicst_tpu.io.tiff as tiff_mod
    from unmicst_tpu.io import preprocess as pp
    from unmicst_tpu.io.tiff import TiffWriter

    model_dir = os.path.join(REFERENCE, "models/nucleiDAPI")
    img = (rng.rand(256, 320) * 60000).astype(np.uint16)
    d = tmp_path / "exemplar-001" / "registration"
    d.mkdir(parents=True)
    pyr = str(d / "pyr.ome.tif")
    with TiffWriter(pyr, bigtiff=False) as tw:
        assert tw.write_pyramid(img, tile=(64, 64), min_size=64) == 2
    flat = str(d / "flat.ome.tif")
    imwrite(flat, img, bigtiff=False)

    reads = []
    orig = tiff_mod.TiffFile.read_page

    def counting(self, i):
        reads.append(self.path)
        return orig(self, i)

    monkeypatch.setattr(tiff_mod.TiffFile, "read_page", counting)
    rep = batch.run_sweep([pyr, flat], model_dir, verbose=False,
                          scaling_factor=0.5, use_pyramid=True)
    assert rep.completed == [pyr, flat] and not rep.failed
    assert pyr not in reads      # stored level only
    assert flat in reads         # flat slide fell through to full res

    out = str(d.parent / "prob_maps")
    # oracle: the stored level run directly, upscaled to full dims
    with tiff_mod.TiffFile(pyr) as tf:
        lvl0 = tf.read_subifd(0, 0)
    lv_d = tmp_path / "exemplar-002" / "registration"
    lv_d.mkdir(parents=True)
    lv = str(lv_d / "lvl.ome.tif")
    imwrite(lv, lvl0, bigtiff=False)
    rep2 = batch.run_sweep([lv], model_dir, verbose=False)
    lout = str(lv_d.parent / "prob_maps")
    for name in ["ContoursPM", "NucleiPM"]:
        a = imread(os.path.join(out, f"pyr_{name}_1.tif"), 0)
        b = imread(os.path.join(lout, f"lvl_{name}_1.tif"), 0)
        np.testing.assert_array_equal(a, pp.upscale_pm(b, img.shape))
    # full-res output contract: maps carry full dims
    assert a.shape == img.shape
