"""TIFF IO: reader vs PIL, writer round trips, append chains, region reads."""

import os

import numpy as np
import pytest
from PIL import Image

from tests.conftest import REFERENCE, needs_reference
from unmicst_tpu.io.tiff import TiffFile, TiffWriter, imread, imwrite, num_pages


@needs_reference
def test_read_fixtures_match_pil():
    for rel, pages in [
        ("UNet sample data/registration/105.tif", 1),
        ("UNet sample data/prob_maps/105_ContoursPM_1.tif", 2),
        ("UNet sample data/prob_maps/105_NucleiPM_1.tif", 1),
    ]:
        path = os.path.join(REFERENCE, rel)
        assert num_pages(path) == pages
        for k in range(pages):
            ours = imread(path, k)
            im = Image.open(path)
            im.seek(k)
            theirs = np.asarray(im)
            assert ours.shape == theirs.shape
            assert np.array_equal(ours.astype(np.int64), theirs.astype(np.int64))


@pytest.mark.parametrize("bigtiff", [False, True])
def test_write_append_roundtrip(tmp_path, rng, bigtiff):
    fn = str(tmp_path / "t.tif")
    x1 = (rng.rand(700, 530) * 65535).astype(np.uint16)
    x2 = (rng.rand(700, 530) * 255).astype(np.uint8)
    x3 = rng.rand(64, 64).astype(np.float32)
    imwrite(fn, x1, bigtiff=bigtiff, append=False)
    imwrite(fn, x2, bigtiff=bigtiff, append=True)
    imwrite(fn, x3, bigtiff=bigtiff, append=True)
    with TiffFile(fn) as tf:
        assert len(tf.pages) == 3
        assert np.array_equal(tf.read_page(0), x1)
        assert np.array_equal(tf.read_page(1), x2)
        assert np.allclose(tf.read_page(2), x3)
    # cross-check with PIL (PIL reads BigTIFF too)
    im = Image.open(fn)
    assert np.array_equal(np.asarray(im), x1)
    im.seek(1)
    assert np.array_equal(np.asarray(im), x2)


def test_region_read(tmp_path, rng):
    fn = str(tmp_path / "r.tif")
    x = (rng.rand(1200, 900) * 65535).astype(np.uint16)
    imwrite(fn, x)
    with TiffFile(fn) as tf:
        assert np.array_equal(tf.read_region(0, 100, 250, 64, 80), x[100:164, 250:330])
        assert np.array_equal(tf.read_region(0, 0, 0, 1200, 900), x)
        # window clipped at image edge comes back zero-padded
        w = tf.read_region(0, 1190, 890, 20, 20)
        assert np.array_equal(w[:10, :10], x[1190:, 890:])
        assert (w[10:, :] == 0).all() and (w[:, 10:] == 0).all()


def test_compressed_read_deflate_lzw(tmp_path, rng):
    # PIL writes compressed TIFFs; verify our decoder agrees.
    x = (rng.rand(300, 200) * 255).astype(np.uint8)
    for codec in ["tiff_deflate", "tiff_lzw", "packbits"]:
        fn = str(tmp_path / f"{codec}.tif")
        Image.fromarray(x).save(fn, compression=codec)
        got = imread(fn)
        assert np.array_equal(got, x), codec


def _write_predictor2_tiff(path, image):
    """Hand-craft a deflate + predictor=2 TIFF (single strip)."""
    import struct
    import zlib

    h, w = image.shape
    diff = image.astype(np.int64).copy()
    diff[:, 1:] -= image.astype(np.int64)[:, :-1]
    raw = diff.astype(image.dtype).tobytes()
    data = zlib.compress(raw)
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, image.dtype.itemsize * 8),
        (259, 3, 1, 8),  # deflate
        (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, h),
        (279, 4, 1, len(data)), (317, 3, 1, 2),  # predictor=2
    ]
    with open(path, "wb") as f:
        f.write(struct.pack("<2sHI", b"II", 42, 8 + len(data) + (1 if len(data) % 2 else 0)))
        f.write(data)
        if len(data) % 2:
            f.write(b"\0")
        f.write(struct.pack("<H", len(entries)))
        for tag, ftype, count, value in entries:
            f.write(struct.pack("<HHII", tag, ftype, count, value))
        f.write(struct.pack("<I", 0))


def _write_strip_tiff(path, image, codec_id, compress_fn, rows_per_strip=37):
    """Hand-craft a multi-strip TIFF with an arbitrary compression tag
    (for codecs PIL/cv2 can't write: zstd 50000, LZMA 34925)."""
    import struct

    h, w = image.shape
    strips = [
        compress_fn(image[r : r + rows_per_strip].tobytes())
        for r in range(0, h, rows_per_strip)
    ]
    n = len(strips)
    offs, pos = [], 8
    for s in strips:
        offs.append(pos)
        pos += len(s)
    arrays_off = pos
    entries = [
        (256, 4, 1, w), (257, 4, 1, h),
        (258, 3, 1, image.dtype.itemsize * 8),
        (259, 3, 1, codec_id), (262, 3, 1, 1),
        (273, 4, n, arrays_off if n > 1 else offs[0]),
        (277, 3, 1, 1), (278, 4, 1, rows_per_strip),
        (279, 4, n, arrays_off + 4 * n if n > 1 else len(strips[0])),
    ]
    ifd_off = arrays_off + (8 * n if n > 1 else 0)
    with open(path, "wb") as f:
        f.write(struct.pack("<2sHI", b"II", 42, ifd_off))
        for s in strips:
            f.write(s)
        if n > 1:
            f.write(struct.pack(f"<{n}I", *offs))
            f.write(struct.pack(f"<{n}I", *(len(s) for s in strips)))
        f.write(struct.pack("<H", len(entries)))
        for tag, ftype, count, value in entries:
            f.write(struct.pack("<HHII", tag, ftype, count, value))
        f.write(struct.pack("<I", 0))


def _zstd_compress(data):
    import zstandard

    return zstandard.ZstdCompressor(level=3).compress(data)


def _lzma_compress(data):
    import lzma as _lzma

    return _lzma.compress(data)  # FORMAT_XZ, what libtiff writes


@pytest.mark.parametrize("codec_id,compress_fn", [
    (50000, _zstd_compress), (34925, _lzma_compress),
])
def test_zstd_lzma_strip_decode(tmp_path, rng, codec_id, compress_fn):
    """tifffile/libtiff-style zstd (50000) and LZMA/xz (34925) strips:
    whole-page and windowed reads, multi-strip, uint8 + uint16."""
    for dtype, hi in ((np.uint8, 255), (np.uint16, 65535)):
        img = (rng.rand(150, 97) * hi).astype(dtype)
        p = str(tmp_path / f"{codec_id}_{dtype.__name__}.tif")
        _write_strip_tiff(p, img, codec_id, compress_fn)
        tf = TiffFile(p)
        np.testing.assert_array_equal(tf.read_page(0), img)
        np.testing.assert_array_equal(
            tf.read_region(0, 30, 10, 60, 50), img[30:90, 10:60]
        )
        tf.close()


@pytest.mark.parametrize("codec_id,compress_fn", [
    (50000, _zstd_compress), (34925, _lzma_compress),
])
def test_zstd_lzma_corrupt_strip_raises(tmp_path, rng, codec_id,
                                        compress_fn):
    img = (rng.rand(40, 30) * 255).astype(np.uint8)
    p = str(tmp_path / "c.tif")
    _write_strip_tiff(p, img, codec_id, compress_fn, rows_per_strip=40)
    blob = bytearray(open(p, "rb").read())
    blob[12] ^= 0xFF  # mid-stream corruption
    open(p, "wb").write(bytes(blob))
    with pytest.raises(ValueError):
        TiffFile(p).read_page(0)


@pytest.mark.parametrize("compression", [None, "deflate", "zstd"])
def test_tiled_writer_roundtrip(tmp_path, rng, compression):
    """Tile-organized output pages: ragged edges, both dtypes, every
    writer codec; readable by our reader AND by PIL (independent
    libtiff-derived tile decode)."""
    for dtype, hi in ((np.uint8, 255), (np.uint16, 65535)):
        img = (rng.rand(300, 210) * hi).astype(dtype)
        p = str(tmp_path / f"t_{dtype.__name__}.tif")
        with TiffWriter(p, bigtiff=False, compression=compression) as tw:
            tw.write(img, tile=(64, 64))
        tf = TiffFile(p)
        assert tf.pages[0].tiled
        np.testing.assert_array_equal(tf.read_page(0), img)
        np.testing.assert_array_equal(
            tf.read_region(0, 50, 30, 100, 120), img[50:150, 30:150]
        )
        tf.close()
        if compression != "zstd":  # PIL lacks zstd
            with Image.open(p) as im:
                np.testing.assert_array_equal(np.asarray(im), img)
    with pytest.raises(ValueError, match="multiples of 16"):
        with TiffWriter(str(tmp_path / "bad.tif")) as tw:
            tw.write(np.zeros((32, 32), np.uint8), tile=(60, 64))


def test_pyramid_writer(tmp_path, rng):
    """write_pyramid: SubIFD (tag 330) chain of 2x box-mean levels, every
    level tiled; the MAIN page chain stays a normal flat full-res page
    (readers that ignore SubIFDs see the usual file)."""
    from unmicst_tpu.io.tiff import _box_downsample2, num_pages

    img = (rng.rand(1200, 900) * 65535).astype(np.uint16)
    p = str(tmp_path / "pyr.tif")
    with TiffWriter(p, bigtiff=True, compression="deflate") as tw:
        n = tw.write_pyramid(img, tile=(128, 128), min_size=128)
    assert n == 2  # 600x450, 300x225 (150x112 < 2*128 on short edge)
    assert num_pages(p) == 1  # main chain unaffected
    tf = TiffFile(p)
    page = tf.pages[0]
    assert page.subifds is not None and len(page.subifds) == 2
    np.testing.assert_array_equal(tf.read_page(0), img)
    lv = img
    for k in range(2):
        lv = _box_downsample2(lv)
        got = tf.read_subifd(0, k)
        np.testing.assert_array_equal(got, lv)
    with pytest.raises(ValueError, match="pyramid level"):
        tf.read_subifd(0, 2)
    # a corrupt SubIFD offset raises a clean ValueError, not struct.error
    tf.pages[0].subifds = np.array([os.path.getsize(p) + 7], np.int64)
    with pytest.raises(ValueError, match="corrupt SubIFD"):
        tf.read_subifd(0, 0)
    tf.close()
    # appending a plain page after a pyramid keeps the chain intact
    with TiffWriter(p, bigtiff=True, append=True) as tw:
        tw.write(np.zeros((40, 40), np.uint8))
    assert num_pages(p) == 2
    with Image.open(p) as im:  # PIL sees the flat full-res page
        np.testing.assert_array_equal(np.asarray(im), img)
    # float32 pages pyramid too (the float mean path of the downsample)
    fimg = rng.rand(700, 600).astype(np.float32)
    pf = str(tmp_path / "pyr_f32.tif")
    with TiffWriter(pf, bigtiff=True) as tw:
        # 350x300 then 175x150 (short edge 150 < 2*128 stops it)
        assert tw.write_pyramid(fimg, tile=(128, 128), min_size=128) == 2
    tf2 = TiffFile(pf)
    np.testing.assert_array_equal(tf2.read_page(0), fimg)
    flv = fimg
    for k in range(2):
        flv = _box_downsample2(flv)
        np.testing.assert_array_equal(tf2.read_subifd(0, k), flv)
    tf2.close()


def test_writer_randomized_roundtrip(tmp_path):
    """Seeded randomized sweep over the writer configuration space
    (shape x dtype x codec x layout x append) — locks the _write_page
    refactor: every combination must round-trip bit-exactly through our
    reader, and strip/deflate pages through PIL too."""
    r = np.random.RandomState(99)
    for trial in range(24):
        h, w = int(r.randint(1, 400)), int(r.randint(1, 400))
        dtype = [np.uint8, np.uint16, np.float32][r.randint(3)]
        img = (r.rand(h, w) * 255).astype(dtype)
        codec = [None, "deflate", "zstd"][r.randint(3)]
        level = int(r.randint(1, 10))
        big = bool(r.randint(2))
        tile = (16 * int(r.randint(1, 5)), 16 * int(r.randint(1, 5))) \
            if r.randint(2) else None
        p = str(tmp_path / f"t{trial}.tif")
        with TiffWriter(p, bigtiff=big, compression=codec,
                        compression_level=level) as tw:
            tw.write(img, tile=tile)
        # append a second page half the time (chain re-link)
        img2 = None
        if r.randint(2):
            img2 = (r.rand(int(r.randint(1, 100)),
                           int(r.randint(1, 100))) * 255).astype(dtype)
            with TiffWriter(p, bigtiff=big, append=True,
                            compression=codec) as tw:
                tw.write(img2)
        tf = TiffFile(p)
        np.testing.assert_array_equal(tf.read_page(0), img, err_msg=str(trial))
        if img2 is not None:
            np.testing.assert_array_equal(tf.read_page(1), img2)
        tf.close()
        if codec != "zstd" and dtype != np.float32:
            with Image.open(p) as im:
                np.testing.assert_array_equal(np.asarray(im), img)


def test_subifd_field_type_13(tmp_path, rng):
    """Tag 330 written with TIFF field type 13 (IFD — what tifffile uses
    on classic files) must parse; an unknown field type must not silently
    drop the pyramid."""
    import struct as _struct

    img = (rng.rand(600, 600) * 255).astype(np.uint8)
    p = str(tmp_path / "p13.tif")
    with TiffWriter(p, bigtiff=False) as tw:
        assert tw.write_pyramid(img, tile=(128, 128), min_size=128) >= 1
    blob = bytearray(open(p, "rb").read())
    # classic IFD: locate the tag-330 entry in the last IFD and flip its
    # field type from LONG (4) to IFD (13)
    (ifd_off,) = _struct.unpack("<I", blob[4:8])
    (n,) = _struct.unpack("<H", blob[ifd_off : ifd_off + 2])
    patched = False
    for i in range(n):
        ent = ifd_off + 2 + 12 * i
        tag, ftype = _struct.unpack("<HH", blob[ent : ent + 4])
        if tag == 330:
            assert ftype == 4
            _struct.pack_into("<H", blob, ent + 2, 13)
            patched = True
    assert patched
    open(p, "wb").write(bytes(blob))
    tf = TiffFile(p)
    assert tf.pages[0].subifds is not None
    assert tf.read_subifd(0, 0).shape == (300, 300)
    tf.close()


def test_zstd_writer_roundtrip(tmp_path, rng):
    """Opt-in zstd output (tag 50000): multi-strip, multi-page append,
    strips are genuine zstd frames (independent zstandard decode)."""
    import zstandard

    img1 = (rng.rand(300, 200) * 255).astype(np.uint8)
    img2 = (rng.rand(300, 200) * 65535).astype(np.uint16)
    p = str(tmp_path / "z.tif")
    imwrite(p, img1, bigtiff=True, compression="zstd")
    imwrite(p, img2, bigtiff=True, append=True, compression="zstd",
            compression_level=6)
    tf = TiffFile(p)
    assert tf.pages[0].compression == 50000
    np.testing.assert_array_equal(tf.read_page(0), img1)
    np.testing.assert_array_equal(tf.read_page(1), img2)
    np.testing.assert_array_equal(tf.read_region(0, 10, 20, 50, 60),
                                  img1[10:60, 20:80])
    # first strip is a plain zstd frame an independent decoder accepts
    pg = tf.pages[0]
    tf._fh.seek(int(pg.strip_offsets[0]))
    frame = tf._fh.read(int(pg.strip_counts[0]))
    assert zstandard.ZstdDecompressor().decompress(
        frame, max_output_size=1 << 20
    ) == img1[: pg.rows_per_strip].tobytes()
    tf.close()


def test_zstd_strip_bomb_bounded(tmp_path):
    """A zstd strip decompressing far beyond its strip geometry must be
    rejected by the output bound, not allocated — BOTH for frames that
    declare their content size in the header (zstandard ignores
    max_output_size for those: the bound must pre-check the declared
    size) and for streaming frames with unknown size."""
    import io as _io

    import zstandard

    def streaming_frame(payload):
        buf = _io.BytesIO()
        with zstandard.ZstdCompressor(level=3).stream_writer(
            buf, closefd=False
        ) as w:
            w.write(payload)
        return buf.getvalue()

    img = np.zeros((8, 8), np.uint8)
    for maker in (_zstd_compress, streaming_frame):
        p = str(tmp_path / "b.tif")
        # strip claims 8x8 but the frame holds 100 MB of zeros
        _write_strip_tiff(p, img, 50000,
                          lambda _: maker(b"\0" * (100 << 20)),
                          rows_per_strip=8)
        with pytest.raises(ValueError):
            TiffFile(p).read_page(0)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_predictor2_decode(tmp_path, rng, dtype):
    """Horizontal-differencing predictor undo runs along the width axis
    (regression: cumsum over the samples axis silently no-op'd)."""
    x = (rng.rand(20, 30) * np.iinfo(dtype).max).astype(dtype)
    fn = str(tmp_path / "p2.tif")
    _write_predictor2_tiff(fn, x)
    got = imread(fn)
    assert np.array_equal(got, x)
    # PIL agrees on the same file
    assert np.array_equal(np.asarray(Image.open(fn)), x)
    # windowed read path too
    with TiffFile(fn) as tf:
        assert np.array_equal(tf.read_region(0, 3, 5, 10, 12), x[3:13, 5:17])


def test_append_to_pil_written_file(tmp_path, rng):
    """The CLI may append to files created by other writers."""
    x1 = (rng.rand(60, 50) * 255).astype(np.uint8)
    x2 = (rng.rand(60, 50) * 255).astype(np.uint8)
    fn = str(tmp_path / "pil.tif")
    Image.fromarray(x1).save(fn)
    imwrite(fn, x2, append=True)
    with TiffFile(fn) as tf:
        assert len(tf.pages) == 2
        assert np.array_equal(tf.read_page(0), x1)
        assert np.array_equal(tf.read_page(1), x2)


def test_truncation_and_corruption_fail_cleanly(tmp_path, rng):
    """Damaged files raise exceptions (never hang or segfault)."""
    x = (rng.rand(64, 64) * 65535).astype(np.uint16)
    fn = str(tmp_path / "ok.tif")
    imwrite(fn, x, bigtiff=False)
    blob = open(fn, "rb").read()
    for cut in [3, 7, 16, len(blob) // 2, len(blob) - 5]:
        bad = str(tmp_path / f"cut{cut}.tif")
        open(bad, "wb").write(blob[:cut])
        with pytest.raises(Exception):
            with TiffFile(bad) as tf:
                tf.read_page(0)
    # random byte flips in the header/IFD region
    for seed in range(5):
        r = np.random.RandomState(seed)
        mutated = bytearray(blob)
        for _ in range(8):
            mutated[r.randint(0, min(256, len(blob)))] = r.randint(0, 256)
        bad = str(tmp_path / f"flip{seed}.tif")
        open(bad, "wb").write(bytes(mutated))
        try:
            with TiffFile(bad) as tf:
                tf.read_page(0)  # may succeed or raise; must return
        except Exception:
            pass


def test_big_endian_input(tmp_path, rng):
    x = (rng.rand(50, 60) * 65535).astype(">u2")
    fn = str(tmp_path / "be.tif")
    Image.fromarray(x.astype("u2")).save(fn)
    assert np.array_equal(imread(fn), x.astype("u2"))


def test_subifd_pyramid_levels_ignored(tmp_path, rng):
    """OME-TIFF pyramids hang downsampled levels off tag 330 (SubIFDs);
    the page chain must expose only full-resolution pages and read_page
    must return full-res data (ROADMAP: pyramidal/subIFD behavior)."""
    import struct

    from unmicst_tpu.io.tiff import TiffFile

    full = (rng.rand(16, 24) * 60000).astype("<u2")
    down = full[::2, ::2].copy()

    def ifd(entries, next_off):
        buf = struct.pack("<H", len(entries))
        for tag, ftype, count, value in entries:
            buf += struct.pack("<HHI", tag, ftype, count)
            buf += struct.pack("<I", value)
        return buf + struct.pack("<I", next_off)

    def page_entries(h, w, data_off, nbytes, extra=()):
        base = [
            (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 16), (259, 3, 1, 1),
            (262, 3, 1, 1), (273, 4, 1, data_off), (277, 3, 1, 1),
            (278, 4, 1, h), (279, 4, 1, nbytes), (339, 3, 1, 1),
        ]
        return sorted(base + list(extra))

    # layout: header | full px | down px | sub-IFD | main IFD0 | main IFD1
    out = bytearray(struct.pack("<2sHI", b"II", 42, 0))
    full_off = len(out); out += full.tobytes()
    down_off = len(out); out += down.tobytes()
    sub_pos = len(out)
    out += ifd(page_entries(8, 12, down_off, down.nbytes), 0)
    ifd0_pos = len(out)
    # second full-res page reuses the same pixel data
    ifd1_pos = ifd0_pos + len(ifd(page_entries(16, 24, full_off, full.nbytes,
                                               [(330, 4, 1, sub_pos)]), 0))
    out += ifd(page_entries(16, 24, full_off, full.nbytes,
                            [(330, 4, 1, sub_pos)]), ifd1_pos)
    out += ifd(page_entries(16, 24, full_off, full.nbytes), 0)
    struct.pack_into("<I", out, 4, ifd0_pos)
    path = str(tmp_path / "pyr.tif")
    with open(path, "wb") as f:
        f.write(bytes(out))

    with TiffFile(path) as tf:
        assert len(tf.pages) == 2  # the SubIFD level is NOT a page
        assert (tf.pages[0].height, tf.pages[0].width) == (16, 24)
        np.testing.assert_array_equal(tf.read_page(0), full)
        np.testing.assert_array_equal(tf.read_page(1), full)


def test_deflate_output_compression_roundtrip(tmp_path, rng):
    """compression='deflate' pages decode identically (tag 8, per-strip
    zlib), and mixed-page append (compressed + not) works."""
    from unmicst_tpu.io.tiff import TiffFile, TiffWriter, imwrite

    # probability-map-like content (smooth -> compressible)
    yy, xx = np.mgrid[0:600, 0:500]
    img = ((yy + xx) % 256).astype(np.uint8)
    noise = (rng.rand(600, 500) * 255).astype(np.uint8)
    p = str(tmp_path / "c.tif")
    imwrite(p, img, bigtiff=True, compression="deflate")
    imwrite(p, noise, bigtiff=True, append=True)  # uncompressed 2nd page
    with TiffFile(p) as tf:
        assert tf.pages[0].compression == 8
        assert tf.pages[1].compression == 1
        np.testing.assert_array_equal(tf.read_page(0), img)
        np.testing.assert_array_equal(tf.read_page(1), noise)
    raw = str(tmp_path / "u.tif")
    imwrite(raw, img, bigtiff=True)
    comp_only = str(tmp_path / "co.tif")
    imwrite(comp_only, img, bigtiff=True, compression="deflate")
    import os

    assert os.path.getsize(comp_only) < os.path.getsize(raw) // 5
    with pytest.raises(ValueError):
        TiffWriter(str(tmp_path / "x.tif"), compression="lzw")


@pytest.mark.parametrize("bigtiff", [False, True])
def test_description_utf8_exact_count(tmp_path, bigtiff):
    """UTF-8 ImageDescription (OME-XML spec) with count == len(bytes)+1.

    The raw IFD entry is parsed by hand so the exactness of the count
    field (no padding slack) is checked against the writer, not just our
    own reader's tolerance."""
    import struct

    fn = str(tmp_path / "d.tif")
    desc = "channel µ-αβ (5 µm)"  # non-ASCII: must survive as UTF-8
    with TiffWriter(fn, bigtiff=bigtiff) as w:
        w.write(np.zeros((4, 4), np.uint8), description=desc)
    with TiffFile(fn) as tf:
        assert tf.pages[0].description == desc

    encoded = desc.encode("utf-8") + b"\x00"
    with open(fn, "rb") as fh:
        blob = fh.read()
    if bigtiff:
        (ifd,) = struct.unpack_from("<Q", blob, 8)
        (n,) = struct.unpack_from("<Q", blob, ifd)
        base, step, cfmt = ifd + 8, 20, "<HHQ"
    else:
        (ifd,) = struct.unpack_from("<I", blob, 4)
        (n,) = struct.unpack_from("<H", blob, ifd)
        base, step, cfmt = ifd + 2, 12, "<HHI"
    counts = {
        struct.unpack_from(cfmt, blob, base + i * step)[0]:
        struct.unpack_from(cfmt, blob, base + i * step)[2]
        for i in range(n)
    }
    assert counts[270] == len(encoded)


def test_description_short_inline_roundtrip(tmp_path):
    """A description short enough for the value slot is stored inline."""
    fn = str(tmp_path / "s.tif")
    with TiffWriter(fn) as w:
        w.write(np.zeros((4, 4), np.uint8), description="ab")
    with TiffFile(fn) as tf:
        assert tf.pages[0].description == "ab"
    # PIL agrees (independent reader; ASCII subset so no codec ambiguity)
    im = Image.open(fn)
    assert im.tag_v2[270] == "ab"


def test_ifd_cycle_raises_not_hangs(tmp_path, rng):
    """A corrupt next-IFD pointer looping back must raise, never hang."""
    import struct

    fn = str(tmp_path / "cyc.tif")
    imwrite(fn, (rng.rand(8, 8) * 255).astype(np.uint8), bigtiff=False)
    blob = bytearray(open(fn, "rb").read())
    (ifd,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd)
    # point the next-IFD field back at the first IFD
    struct.pack_into("<I", blob, ifd + 2 + 12 * n, ifd)
    open(fn, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="cycle"):
        TiffFile(fn)
    with pytest.raises(ValueError, match="cycle"):
        TiffWriter(fn, append=True)


def test_short_strip_list_rejected(tmp_path, rng):
    """Fewer strips than the header promises must not leak uninitialized
    memory as pixels."""
    import struct

    fn = str(tmp_path / "short.tif")
    img = (rng.rand(64, 16) * 255).astype(np.uint8)
    with TiffWriter(fn, bigtiff=False) as tw:
        tw.write(img)
    blob = bytearray(open(fn, "rb").read())
    (ifd,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd)
    for i in range(n):
        tag, ftype, cnt = struct.unpack_from("<HHI", blob, ifd + 2 + 12 * i)
        if tag == 257:  # ImageLength: claim double the height
            struct.pack_into("<I", blob, ifd + 2 + 12 * i + 8, 128)
    open(fn, "wb").write(bytes(blob))
    with TiffFile(fn) as tf:
        with pytest.raises(ValueError, match="cover"):
            tf.read_page(0)


def test_native_corrupt_so_falls_back(tmp_path, monkeypatch):
    # regression: a truncated/foreign .so used to raise OSError out of
    # CDLL on every decode instead of degrading to the Python codecs
    from unmicst_tpu.io import _native

    bad = tmp_path / "libbad.so"
    bad.write_bytes(b"not an elf")
    monkeypatch.setattr(_native, "_LIB_PATH", str(bad))
    monkeypatch.setattr(_native, "_lib", None)
    monkeypatch.setattr(_native, "_load_failed", False)
    monkeypatch.setattr(_native, "_build_attempted", True)
    assert _native.get_lib() is None
    assert _native.lzw_decode(b"x", 16) is None


def test_no_autobuild_env_flag_is_value_sensitive(monkeypatch):
    # regression: UNMICST_NO_AUTOBUILD=0 used to DISABLE the autobuild
    from unmicst_tpu.io import _native

    monkeypatch.setenv("UNMICST_NO_AUTOBUILD", "0")
    assert not _native._autobuild_disabled()
    monkeypatch.setenv("UNMICST_NO_AUTOBUILD", "1")
    assert _native._autobuild_disabled()
    monkeypatch.delenv("UNMICST_NO_AUTOBUILD")
    assert not _native._autobuild_disabled()


def test_native_predictor_undo_rejects_wide_samples():
    # the C routine only handles 1/2-byte samples; returning arr for a
    # float32 input would hand difference values back as pixels
    from unmicst_tpu.io import _native

    assert _native.predictor_undo(np.zeros((2, 3), np.float32)) is None


def test_uncompressed_noncontiguous_strips(tmp_path, rng):
    # the contiguous-strip fast path must not misread files whose strips
    # are stored out of order (legal TIFF; offsets are authoritative)
    import struct

    img = rng.randint(0, 255, (8, 6), np.uint8)
    # classic little-endian TIFF, 2 strips of 4 rows, strip 1 stored FIRST
    strip0, strip1 = img[:4].tobytes(), img[4:].tobytes()
    data_start = 8
    off1 = data_start                  # strip 1 bytes first in the file
    off0 = data_start + len(strip1)    # strip 0 bytes after
    ifd_off = off0 + len(strip0)
    entries = [
        (256, 3, 1, 6),        # ImageWidth
        (257, 3, 1, 8),        # ImageLength
        (258, 3, 1, 8),        # BitsPerSample
        (259, 3, 1, 1),        # Compression: none
        (262, 3, 1, 1),        # Photometric
        (273, 4, 2, ifd_off + 2 + 12 * 9 + 4),  # StripOffsets array
        (277, 3, 1, 1),        # SamplesPerPixel
        (278, 3, 1, 4),        # RowsPerStrip
        (279, 4, 2, ifd_off + 2 + 12 * 9 + 4 + 8),  # StripByteCounts array
    ]
    blob = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    blob += strip1 + strip0
    blob += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        blob += struct.pack("<HHII", tag, typ, cnt, val)
    blob += struct.pack("<I", 0)  # next IFD
    blob += struct.pack("<II", off0, off1)  # strip offsets (logical order)
    blob += struct.pack("<II", len(strip0), len(strip1))
    path = tmp_path / "ooo.tif"
    path.write_bytes(bytes(blob))
    got = TiffFile(str(path)).read_page(0)
    np.testing.assert_array_equal(got, img)


def test_native_inflate_matches_zlib(rng):
    """Native DEFLATE decode (native/tiffcodec.cpp::unmicst_inflate) must
    reproduce zlib byte-for-byte across block types: dynamic-Huffman
    (image-like), fixed-Huffman (tiny inputs), stored (incompressible),
    and multi-block streams from compressobj flushes."""
    import zlib as _zlib

    from unmicst_tpu.io import _native

    if _native.get_lib() is None:
        pytest.skip("native codec library unavailable")
    img = (rng.rand(257, 61) * 255).astype(np.uint8).tobytes()
    payloads = [
        img,                                        # dynamic blocks
        b"abc",                                     # fixed block
        b"",                                        # empty stream
        np.frombuffer(os.urandom(70000), np.uint8).tobytes(),  # stored
        (np.arange(100000) % 251).astype(np.uint16).tobytes(),  # matches
    ]
    for raw in payloads:
        for level in (0, 1, 6, 9):
            comp = _zlib.compress(raw, level)
            out = _native.inflate(comp, len(raw) + 64)
            assert out is not None
            assert out.tobytes() == raw
    co = _zlib.compressobj(6)
    multi = co.compress(img) + co.flush(_zlib.Z_FULL_FLUSH) + co.flush()
    out = _native.inflate(multi, len(img) + 64)
    assert out.tobytes() == img


def test_native_inflate_rejects_corrupt_and_oversize(rng):
    """Corrupt streams (bad adler32, truncation, bit flips) and
    capacity-exceeding output must raise, never crash or return garbage."""
    import zlib as _zlib

    from unmicst_tpu.io import _native

    if _native.get_lib() is None:
        pytest.skip("native codec library unavailable")
    raw = (rng.rand(64, 64) * 255).astype(np.uint8).tobytes()
    comp = _zlib.compress(raw, 6)
    bad = bytearray(comp)
    bad[-1] ^= 0xFF  # adler32 trailer
    with pytest.raises(ValueError):
        _native.inflate(bytes(bad), len(raw) + 64)
    with pytest.raises(ValueError):
        _native.inflate(comp[: len(comp) // 2], len(raw) + 64)
    with pytest.raises(ValueError):
        _native.inflate(comp, len(raw) // 2)  # undersized buffer


def test_deflate_tiff_read_uses_native_path(tmp_path, rng, monkeypatch):
    """Full-page deflate reads route through the one-call batched native
    decode (all strips in one ctypes crossing), and windowed reads still
    route per-strip through the native inflate."""
    from unmicst_tpu.io import _native

    if _native.get_lib() is None:
        pytest.skip("native codec library unavailable")
    img = (rng.rand(300, 200) * 65535).astype(np.uint16)
    fn = str(tmp_path / "d.tif")
    imwrite(fn, img, compression="deflate")
    batched, per_strip = [], []
    orig_batch = _native.decode_strips
    orig = _native.inflate

    def spy_batch(span, so, sl, do, dl, codec, out):
        batched.append(len(so))
        return orig_batch(span, so, sl, do, dl, codec, out)

    def spy(data, max_out):
        per_strip.append(len(data))
        return orig(data, max_out)

    monkeypatch.setattr(_native, "decode_strips", spy_batch)
    monkeypatch.setattr(_native, "inflate", spy)
    got = TiffFile(fn).read_page(0)
    np.testing.assert_array_equal(got, img)
    assert batched == [len(TiffFile(fn).pages[0].strip_offsets)]
    assert not per_strip, "full-page read fell back to per-strip decode"
    # windowed reads batch the intersecting strip range in one call too
    win = TiffFile(fn).read_region(0, 37, 11, 64, 150)
    np.testing.assert_array_equal(win, img[37:101, 11:161])
    assert len(batched) == 2 and batched[1] <= batched[0]
    assert not per_strip, "windowed read fell back to per-strip decode"


def test_windowed_batched_equals_per_strip(tmp_path, rng, monkeypatch):
    """read_region through the batched range decode == the per-strip
    fallback, across window shapes (strip-aligned, straddling, partial
    columns, beyond-image padding) and codecs."""
    from unmicst_tpu.io import _native

    if _native.get_lib() is None:
        pytest.skip("native codec library unavailable")
    from PIL import Image

    img = (rng.rand(301, 211) * 65535).astype(np.uint16)
    for codec in ("tiff_adobe_deflate", "tiff_lzw"):
        fn = str(tmp_path / f"{codec}.tif")
        Image.fromarray(img).save(fn, compression=codec)
        windows = [(0, 0, 301, 211), (8, 0, 8, 211), (3, 5, 50, 60),
                   (290, 200, 40, 40), (0, 0, 1, 1)]
        for r0, c0, nr, nc in windows:
            got = TiffFile(fn).read_region(0, r0, c0, nr, nc)
            monkeypatch.setattr(_native, "decode_strips", lambda *a: None)
            want = TiffFile(fn).read_region(0, r0, c0, nr, nc)
            monkeypatch.undo()
            np.testing.assert_array_equal(got, want, err_msg=f"{codec} {r0},{c0}")


def test_native_deflate_encoder_roundtrips(rng):
    """Native encoder output decodes bit-exactly via BOTH independent
    zlib and our own native inflate, across payload shapes that exercise
    every block type (stored for noise, dynamic for structure) and the
    length-limit fixup (skewed histograms)."""
    import zlib as _z

    from unmicst_tpu.io import _native

    if _native.get_lib() is None:
        pytest.skip("native codec library unavailable")
    payloads = [
        b"",
        b"a",
        bytes(100000),                                   # one long run
        rng.bytes(300000),                               # incompressible
        (rng.rand(200000) * 4).astype(np.uint8).tobytes(),   # skewed freqs
        (np.arange(150000) % 251).astype(np.uint8).tobytes(),
        (rng.rand(65536) * 400).astype(np.uint16).tobytes(),
        b"the quick brown fox " * 20000,
    ]
    for k, raw in enumerate(payloads):
        comp = _native.deflate(raw)
        assert _z.decompress(comp) == raw, k
        got = _native.inflate(comp, len(raw) + 16)
        assert bytes(got) == raw, k


def test_deflate_writer_native_output_read_by_pil(tmp_path, rng, monkeypatch):
    """Pages written through the native encoder (default level 3) decode
    identically in PIL (independent zlib) and in our reader; with the
    native lib masked the writer falls back to zlib and stays readable."""
    from PIL import Image

    from unmicst_tpu.io import _native

    img = (rng.rand(317, 203) * 65535).astype(np.uint16)
    p = str(tmp_path / "n.tif")
    imwrite(p, img, bigtiff=False, compression="deflate")
    with Image.open(p) as im:
        np.testing.assert_array_equal(np.asarray(im), img)
    np.testing.assert_array_equal(imread(p), img)
    # high level takes the native chain-search encoder, still round-trips
    p9 = str(tmp_path / "n9.tif")
    imwrite(p9, img, bigtiff=False, compression="deflate",
            compression_level=9)
    np.testing.assert_array_equal(imread(p9), img)
    with Image.open(p9) as im:
        np.testing.assert_array_equal(np.asarray(im), img)
    # masked lib: zlib fallback inside _encode_deflate
    monkeypatch.setattr(_native, "deflate", lambda d: None)
    pf = str(tmp_path / "f.tif")
    imwrite(pf, img, bigtiff=False, compression="deflate")
    np.testing.assert_array_equal(imread(pf), img)


def test_chain_deflate_roundtrip_all_levels(rng, monkeypatch):
    """The chain-search encoder (levels 4..9) must produce valid zlib
    streams on adversarial payloads — long runs (deep hash chains),
    periodic data (lazy-match churn), incompressible noise, empty and
    sub-minimum-match inputs — and fall back to zlib when the lib is
    absent."""
    import zlib as _z

    from unmicst_tpu.io import _native
    from unmicst_tpu.io.tiff import _encode_deflate

    if _native.get_lib() is None:
        pytest.skip("native lib not built")
    payloads = [
        b"",
        b"a",
        b"abc",
        b"\x00" * 300000,                      # one run > block size
        bytes(range(256)) * 1200,              # periodic, period 256
        b"ab" * 100000,                        # period 2: maximal chains
        (rng.rand(200000) * 255).astype(np.uint8).tobytes(),  # noise
        np.kron(rng.rand(256, 256),
                np.ones((2, 2))).astype(np.float32).tobytes(),  # smooth
    ]
    for data in payloads:
        for lvl in (4, 6, 9):
            out = _native.deflate_chain(data, lvl)
            assert _z.decompress(out) == data
        assert _z.decompress(_encode_deflate(data, 6)) == data
    # chain ratio must beat greedy meaningfully on smooth data (the
    # reason the mode exists)
    smooth = np.kron(rng.rand(128, 128), np.ones((8, 8)))
    smooth = (smooth * 4000).astype(np.uint16).tobytes()
    n_chain = len(_native.deflate_chain(smooth, 6))
    n_greedy = len(_native.deflate(smooth))
    assert n_chain < n_greedy * 0.75
    # masked lib: levels >= 4 fall back to zlib
    monkeypatch.setattr(_native, "deflate_chain", lambda d, lvl: None)
    assert _z.decompress(_encode_deflate(b"xyz" * 1000, 6)) == b"xyz" * 1000


def test_batched_decode_falls_back_per_strip(tmp_path, rng, monkeypatch):
    """With the batched entry point masked, compressed reads take the
    per-strip loop and produce identical pixels (the fallback the
    sparse/descending/predictor cases rely on)."""
    from unmicst_tpu.io import _native

    img = (rng.rand(300, 200) * 65535).astype(np.uint16)
    fn = str(tmp_path / "d.tif")
    imwrite(fn, img, compression="deflate")
    monkeypatch.setattr(_native, "decode_strips", lambda *a: None)
    got = TiffFile(fn).read_page(0)
    np.testing.assert_array_equal(got, img)


# --- libtiff (OpenCV) cross-validation: streams encoded by an
# independent production encoder, and our writer read back by libtiff ---

_CV2_CODECS = [("none", 1), ("lzw", 5), ("deflate", 8),
               ("adobe_deflate", 32946), ("packbits", 32773)]


@pytest.mark.parametrize("name,code", _CV2_CODECS)
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_reader_against_libtiff_encoder(tmp_path, rng, name, code, dtype):
    """libtiff (via cv2) is an encoder we did not write: its strip
    layout, codec framing, and tag choices validate the reader against
    streams the builder did not construct to match it."""
    cv2 = pytest.importorskip("cv2")
    hi = 255 if dtype == np.uint8 else 65535
    img = (rng.rand(203, 317) * hi).astype(dtype)
    p = str(tmp_path / f"{name}.tif")
    assert cv2.imwrite(p, img, [cv2.IMWRITE_TIFF_COMPRESSION, code])
    got = TiffFile(p).read_page(0)
    np.testing.assert_array_equal(got, img)


@pytest.mark.parametrize("compression,level", [
    (None, 3),
    ("deflate", 3),   # native greedy encoder
    ("deflate", 6),   # native chain-search encoder
])
def test_libtiff_reads_our_writer(tmp_path, rng, compression, level):
    """libtiff (via cv2) — a decoder we did not write — must accept both
    native deflate encoders' streams, and our tiled pages."""
    cv2 = pytest.importorskip("cv2")
    img = (rng.rand(203, 317) * 65535).astype(np.uint16)
    p = str(tmp_path / "ours.tif")
    imwrite(p, img, compression=compression, compression_level=level)
    back = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(back, img)
    pt = str(tmp_path / "ours_tiled.tif")
    imwrite(pt, img, compression=compression, compression_level=level,
            tile=(64, 64))
    back = cv2.imread(pt, cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(back, img)


# --- tile-organized pages (OME pyramids are typically 512x512-tiled);
# fixtures hand-built per TIFF 6.0 ("Tiled Images"): every tile stores
# the full tile_w x tile_h, edge tiles padded ---


def _write_tiled_tiff(path, img, tile_w, tile_h, compression=None,
                      predictor=1):
    import struct
    import zlib as _zlib

    h, w = img.shape
    itemsize = img.dtype.itemsize
    tiles = []
    for r0 in range(0, h, tile_h):
        for c0 in range(0, w, tile_w):
            t = np.zeros((tile_h, tile_w), img.dtype)
            blk = img[r0 : r0 + tile_h, c0 : c0 + tile_w]
            t[: blk.shape[0], : blk.shape[1]] = blk
            if predictor == 2:
                t = t.copy()
                t[:, 1:] = (t[:, 1:].astype(np.int64)
                            - t[:, :-1].astype(np.int64)).astype(img.dtype)
            raw = t.tobytes()
            tiles.append(_zlib.compress(raw, 6) if compression else raw)
    ntiles = len(tiles)
    header = 8
    ifd_off = header
    nentries = 12
    ifd_size = 2 + nentries * 12 + 4
    arrays_off = ifd_off + ifd_size
    offsets_off = arrays_off
    counts_off = offsets_off + 4 * ntiles
    data_off = counts_off + 4 * ntiles
    offs, pos = [], data_off
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    comp_tag = 8 if compression else 1
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, itemsize * 8),
        (259, 3, 1, comp_tag), (262, 3, 1, 1), (277, 3, 1, 1),
        (317, 3, 1, predictor), (322, 3, 1, tile_w), (323, 3, 1, tile_h),
        (324, 4, ntiles, offsets_off), (325, 4, ntiles, counts_off),
        (339, 3, 1, 1),
    ]
    assert len(entries) == nentries
    blob = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    blob += struct.pack("<H", nentries)
    for tag, typ, cnt, val in sorted(entries):
        blob += struct.pack("<HHII", tag, typ, cnt, val)
    blob += struct.pack("<I", 0)
    blob += struct.pack(f"<{ntiles}I", *offs)
    blob += struct.pack(f"<{ntiles}I", *(len(t) for t in tiles))
    for t in tiles:
        blob += t
    with open(path, "wb") as f:
        f.write(bytes(blob))


@pytest.mark.parametrize("compression", [None, "deflate"])
@pytest.mark.parametrize("predictor", [1, 2])
def test_tiled_page_whole_and_windowed(tmp_path, rng, compression,
                                       predictor):
    """Tile-organized pages: whole-page read, windowed reads crossing
    tile boundaries, and edge-tile padding discard — with and without
    Deflate + horizontal predictor (the common pyramid combination)."""
    img = (rng.rand(150, 203) * 65535).astype(np.uint16)  # 64px tiles:
    p = str(tmp_path / "tiled.tif")                        # ragged edges
    _write_tiled_tiff(p, img, 64, 64, compression, predictor)
    tf = TiffFile(p)
    assert tf.pages[0].tiled
    np.testing.assert_array_equal(tf.read_page(0), img)
    # windows: interior crossing 4 tiles, exact tile, edge-clipped
    for (r0, c0, nr, nc) in [(30, 30, 70, 70), (64, 64, 64, 64),
                             (100, 150, 50, 53), (0, 0, 1, 203)]:
        got = tf.read_region(0, r0, c0, nr, nc)  # samples==1 -> 2D
        np.testing.assert_array_equal(got, img[r0 : r0 + nr, c0 : c0 + nc])


def test_tiled_batched_matches_per_tile(tmp_path, rng):
    """The one-call native tile-band decode must agree with the per-tile
    loop on every window shape — including a narrow column window whose
    file span is sparse (the batched path declines it and falls back)."""
    img = (rng.rand(256, 512) * 65535).astype(np.uint16)
    p = str(tmp_path / "tb.tif")
    _write_tiled_tiff(p, img, 64, 64, "deflate", 2)
    tf = TiffFile(p)
    windows = [(0, 0, 256, 512),    # whole page (dense span)
               (10, 400, 200, 70),  # tall narrow column (sparse span)
               (60, 60, 10, 10)]    # single interior tile
    for (r0, c0, nr, nc) in windows:
        got = tf.read_region(0, r0, c0, nr, nc)
        orig = TiffFile._read_tiles_batched
        TiffFile._read_tiles_batched = lambda *a, **kw: None
        try:
            ref = tf.read_region(0, r0, c0, nr, nc)
        finally:
            TiffFile._read_tiles_batched = orig
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_array_equal(got, img[r0 : r0 + nr, c0 : c0 + nc])


def test_tiled_int16_predictor(tmp_path, rng):
    """Predictor arithmetic on signed 16-bit tiles (wraparound must use
    modular arithmetic, not saturate)."""
    img = (rng.rand(100, 100) * 60000 - 30000).astype(np.int16)
    p = str(tmp_path / "t16.tif")
    _write_tiled_tiff(p, img, 32, 32, compression="deflate", predictor=2)
    # SampleFormat tag says unsigned in the helper; patch dtype expectation
    # by comparing through the unsigned view (bit pattern equality)
    got = TiffFile(p).read_page(0)
    np.testing.assert_array_equal(got.view(np.int16) if got.dtype == np.uint16 else got, img)
