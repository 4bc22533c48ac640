"""Native CZI/ND2 readers against hand-built container fixtures.

The fixtures are constructed byte-by-byte from the public container specs
(ZISRAW segments; ND2 chunk map) — the same layouts ``czifile`` and
``nd2reader`` parse — so these tests pin the dispatch path the reference
exercises at ``UnMicst1-5.py:798-804`` without third-party readers.
"""

import os
import struct

import numpy as np
import pytest

from tests.conftest import REFERENCE, needs_reference

from unmicst_tpu.io.czi import CziFile, read_czi_channel
from unmicst_tpu.io.nd2 import Nd2File, read_nd2_channel
from unmicst_tpu.io.slides import read_channel

# ---------------------------------------------------------------------------
# CZI fixture writer (ZISRAW segments)
# ---------------------------------------------------------------------------


def _segment(sid: bytes, payload: bytes, alloc: int = None) -> bytes:
    alloc = alloc if alloc is not None else -(-len(payload) // 32) * 32
    head = struct.pack("<16sqq", sid, alloc, len(payload))
    return head + payload + b"\x00" * (alloc - len(payload))


def _dir_entry(pixel_type, file_pos, compression, dims) -> bytes:
    out = b"DV" + struct.pack("<iqii", pixel_type, file_pos, 0, compression)
    out += b"\x00" * 6  # pyramid type + reserved
    out += struct.pack("<i", len(dims))
    for name, (start, size) in dims.items():
        out += struct.pack(
            "<4siifi", name.encode(), start, size, float(start), size
        )
    return out


def _encode_pixels(pix: bytes, compression: int, hilo: bool) -> bytes:
    """Compress fixture pixel bytes per the ZISRAW compression id."""
    if compression not in (5, 6):
        return pix  # uncompressed, or deliberately-unsupported ids verbatim
    import zstandard

    payload = pix
    if compression == 6 and hilo:
        a = np.frombuffer(pix, np.uint8).reshape(-1, 2)
        payload = a[:, 0].tobytes() + a[:, 1].tobytes()
    frame = zstandard.ZstdCompressor().compress(payload)
    if compression == 5:
        return frame
    # zstd1: size-1 header (no params) or size-3 header w/ hi-lo chunk
    return (b"\x03\x01\x01" if hilo else b"\x01") + frame


def write_czi(path, planes, pixel_type=1, compression=0, tile_split=None,
              hilo=False, channel_names=None):
    """planes: list of 2-D arrays, one per channel (single scene/time).

    ``tile_split``: optional column index — splits each plane into two
    mosaic sub-blocks to exercise mosaic assembly.
    ``compression``: ZISRAW id (0 none, 5 zstd0, 6 zstd1; others written
    verbatim to test rejection); ``hilo`` packs 16-bit hi/lo byte planes
    under zstd1.
    """
    blocks = []  # (entry_dims, pixel bytes)
    for c, plane in enumerate(planes):
        h, w = plane.shape
        pieces = (
            [(0, plane)] if tile_split is None
            else [(0, plane[:, :tile_split]), (tile_split, plane[:, tile_split:])]
        )
        for x0, piece in pieces:
            dims = {
                "X": (x0, piece.shape[1]),
                "Y": (0, piece.shape[0]),
                "C": (c, 1),
            }
            blocks.append((dims, _encode_pixels(
                piece.astype("<u2").tobytes(), compression, hilo
            )))
    _write_czi_blocks(path, blocks, pixel_type, compression,
                      channel_names=channel_names)


def _write_czi_blocks(path, blocks, pixel_type=1, compression=0,
                      channel_names=None):
    """Low-level container writer over pre-encoded (dims, payload) blocks
    (JXR tests hand it payloads the reader's backend decodes)."""
    file_header = struct.pack(
        "<ii8x16s16si", 1, 0, b"\x00" * 16, b"\x00" * 16, 0
    )
    # positions are filled after layout below
    out = bytearray()
    out += _segment(b"ZISRAWFILE", file_header + struct.pack("<qqiq", 0, 0, 0, 0))
    sub_positions = []
    for dims, pix in blocks:
        sub_positions.append(len(out))
        entry = _dir_entry(pixel_type, 0, compression, dims)
        sb_head = struct.pack("<iiq", 0, 0, len(pix)) + entry
        payload = sb_head + b"\x00" * (max(256, len(entry) + 16) - len(sb_head)) + pix
        out += _segment(b"ZISRAWSUBBLOCK", payload)
    dir_pos = len(out)
    dir_payload = struct.pack("<i", len(blocks)) + b"\x00" * 124
    for (dims, _), pos in zip(blocks, sub_positions):
        dir_payload += _dir_entry(pixel_type, pos, compression, dims)
    out += _segment(b"ZISRAWDIRECTORY", dir_payload)
    # back-patch the directory position into the file header (payload
    # offset 52; +32 skips the segment header)
    struct.pack_into("<q", out, 32 + 52, dir_pos)
    if channel_names is not None:
        # ZISRAWMETADATA: XmlSize, AttachmentSize, 248 spare, XML; the
        # header's MetadataPosition lives at payload offset 60
        meta_pos = len(out)
        chans = "".join(
            f'<Channel Id="Channel:{i}"'
            + (f' Name="{n}"' if n is not None else "") + "/>"
            for i, n in enumerate(channel_names)
        )
        xml = (
            "<ImageDocument><Metadata><Information><Image><Dimensions>"
            f"<Channels>{chans}</Channels></Dimensions></Image>"
            "</Information></Metadata></ImageDocument>"
        ).encode()
        out += _segment(
            b"ZISRAWMETADATA",
            struct.pack("<ii", len(xml), 0) + b"\x00" * 248 + xml,
        )
        struct.pack_into("<q", out, 32 + 60, meta_pos)
    with open(path, "wb") as f:
        f.write(out)


# ---------------------------------------------------------------------------
# ND2 fixture writer (chunk map container)
# ---------------------------------------------------------------------------


def _nd2_chunk(name: bytes, data: bytes) -> bytes:
    return struct.pack("<IIQ", 0x0ABECEDA, len(name), len(data)) + name + data


def _lv_uint(name: str, value: int) -> bytes:
    # type 3 (u32), name length in UTF-16 chars, name, value
    enc = name.encode("utf-16-le")
    return struct.pack("<BB", 3, len(name)) + enc + struct.pack("<I", value)


def write_nd2(path, frames):
    """frames: list of [H, W, C] uint16 arrays (component-interleaved)."""
    h, w, comp = frames[0].shape
    attrs = (
        _lv_uint("uiWidth", w) + _lv_uint("uiHeight", h)
        + _lv_uint("uiComp", comp) + _lv_uint("uiBpcInMemory", 16)
    )
    out = bytearray()
    offsets = {}
    name = b"ImageAttributesLV!"
    offsets[name] = len(out)
    out += _nd2_chunk(name, attrs)
    for i, fr in enumerate(frames):
        name = f"ImageDataSeq|{i}!".encode()
        offsets[name] = len(out)
        data = struct.pack("<d", 0.0) + fr.astype("<u2").tobytes()
        out += _nd2_chunk(name, data)
    map_data = b"".join(
        nm + struct.pack("<QQ", off, 0) for nm, off in offsets.items()
    ) + b"ND2 CHUNK MAP SIGNATURE 0000001!" + struct.pack("<QQ", 0, 0)
    map_pos = len(out)
    out += _nd2_chunk(b"ND2 CHUNK MAP SIGNATURE 0000001!", map_data)
    out += b"ND2 CHUNK MAP SIGNATURE 0000001!" + struct.pack("<Q", map_pos)
    with open(path, "wb") as f:
        f.write(out)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_czi_two_channels(tmp_path, rng):
    planes = [(rng.rand(40, 60) * 60000).astype(np.uint16) for _ in range(2)]
    path = str(tmp_path / "x.czi")
    write_czi(path, planes)
    with CziFile(path) as czi:
        assert czi.channels() == 2
    for c in range(2):
        np.testing.assert_array_equal(read_czi_channel(path, c), planes[c])
    # the CLI dispatch path (UnMicst1-5.py:798-801 equivalence)
    np.testing.assert_array_equal(read_channel(path, "czi", 1), planes[1])


def test_czi_mosaic_assembly(tmp_path, rng):
    plane = (rng.rand(32, 50) * 60000).astype(np.uint16)
    path = str(tmp_path / "m.czi")
    write_czi(path, [plane], tile_split=20)
    np.testing.assert_array_equal(read_czi_channel(path, 0), plane)


def test_czi_zstd0_roundtrip(tmp_path, rng):
    """zstd0 (bare-frame) sub-blocks decode identically, whole-plane and
    windowed (modern ZEN default export compression)."""
    pytest.importorskip("zstandard")
    planes = [(rng.rand(40, 60) * 60000).astype(np.uint16) for _ in range(2)]
    path = str(tmp_path / "z0.czi")
    write_czi(path, planes, compression=5, tile_split=25)
    for c in range(2):
        np.testing.assert_array_equal(read_czi_channel(path, c), planes[c])
    from unmicst_tpu.io.slides import open_channel_source

    with open_channel_source(path, "czi", 1) as src:
        got = np.concatenate([src.read_rows(r, 9) for r in range(0, 40, 9)])
        np.testing.assert_array_equal(got[:40], planes[1])


def test_czi_zstd1_roundtrip(tmp_path, rng):
    """zstd1 decodes for both header shapes: size-1 (no params) and size-3
    with the hi-lo byte-packing parameter chunk."""
    pytest.importorskip("zstandard")
    plane = (rng.rand(33, 47) * 60000).astype(np.uint16)
    for hilo in (False, True):
        path = str(tmp_path / f"z1_{hilo}.czi")
        write_czi(path, [plane], compression=6, hilo=hilo, tile_split=20)
        np.testing.assert_array_equal(read_czi_channel(path, 0), plane)


def test_czi_zstd1_bad_header(tmp_path, rng):
    """Corrupt zstd1 headers (unknown chunk id) raise a clean ValueError."""
    pytest.importorskip("zstandard")
    import zstandard

    plane = (rng.rand(8, 8) * 100).astype(np.uint16)
    frame = zstandard.ZstdCompressor().compress(plane.astype("<u2").tobytes())
    path = str(tmp_path / "bad1.czi")
    write_czi(path, [plane], compression=6)  # payload = b"\x01" + frame
    raw = bytearray(open(path, "rb").read())
    k = bytes(raw).index(b"\x01" + frame[:8])
    raw[k] = 3  # now declares a 3-byte header whose chunk id is the zstd
    with open(path, "wb") as f:  # magic's first byte (0x28) — undefined
        f.write(bytes(raw))
    with pytest.raises(ValueError, match="zstd1"):
        read_czi_channel(path, 0)


def test_czi_zstd_corrupt_frame(tmp_path, rng):
    """A valid container with a garbage zstd frame errors cleanly."""
    pytest.importorskip("zstandard")
    import zstandard

    plane = (rng.rand(12, 12) * 100).astype(np.uint16)
    frame = zstandard.ZstdCompressor().compress(plane.astype("<u2").tobytes())
    path = str(tmp_path / "cf.czi")
    write_czi(path, [plane], compression=5)
    blob = bytearray(open(path, "rb").read())
    k = bytes(blob).index(frame)
    blob[k : k + 4] = b"\xde\xad\xbe\xef"
    with open(path, "wb") as f:
        f.write(bytes(blob))
    with pytest.raises(ValueError, match="zstd"):
        read_czi_channel(path, 0)


def test_zstd_unpack_hilo_inverse():
    from unmicst_tpu.io import zstd as z

    data = bytes(range(16))
    a = np.frombuffer(data, np.uint8).reshape(-1, 2)
    packed = a[:, 0].tobytes() + a[:, 1].tobytes()
    assert z.unpack_hilo(packed, 2) == data
    assert z.unpack_hilo(data, 1) == data  # non-16-bit passthrough


def test_czi_compressed_rejected(tmp_path, rng):
    plane = (rng.rand(8, 8) * 100).astype(np.uint16)
    path = str(tmp_path / "z.czi")
    write_czi(path, [plane], compression=4)  # JPEG-XR
    with pytest.raises(NotImplementedError, match="compression=4"):
        read_czi_channel(path, 0)


def test_czi_missing_channel(tmp_path, rng):
    plane = (rng.rand(8, 8) * 100).astype(np.uint16)
    path = str(tmp_path / "c.czi")
    write_czi(path, [plane])
    with pytest.raises(IndexError):
        read_czi_channel(path, 3)


def test_nd2_multicomponent(tmp_path, rng):
    frame = (rng.rand(30, 44, 3) * 60000).astype(np.uint16)
    path = str(tmp_path / "x.nd2")
    write_nd2(path, [frame])
    with Nd2File(path) as nd2:
        assert (nd2.height, nd2.width, nd2.components) == (30, 44, 3)
    for c in range(3):
        np.testing.assert_array_equal(
            read_nd2_channel(path, c), frame[:, :, c]
        )
    np.testing.assert_array_equal(
        read_channel(path, "nd2", 2), frame[:, :, 2]
    )


def test_nd2_single_component_frames(tmp_path, rng):
    frames = [
        (rng.rand(20, 25, 1) * 60000).astype(np.uint16) for _ in range(3)
    ]
    path = str(tmp_path / "f.nd2")
    write_nd2(path, frames)
    for i in range(3):
        np.testing.assert_array_equal(
            read_nd2_channel(path, i), frames[i][:, :, 0]
        )
    with pytest.raises(IndexError):
        read_nd2_channel(path, 5)


def test_nd2_bad_signature(tmp_path):
    path = str(tmp_path / "bad.nd2")
    with open(path, "wb") as f:
        f.write(b"\x00" * 64)
    with pytest.raises(ValueError, match="signature"):
        Nd2File(path)


def test_cli_solo_czi_end_to_end(tmp_path, rng):
    """--tool unmicst-solo on a .czi input runs the full pipeline (the
    reference needs third-party czifile; here the native reader serves it)."""
    import os

    from unmicst_tpu import cli
    from unmicst_tpu.io.tiff import num_pages

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plane = (rng.rand(96, 120) * 60000).astype(np.uint16)
    src = tmp_path / "s" / "registration" / "img.czi"
    src.parent.mkdir(parents=True)
    write_czi(str(src), [plane])
    out = tmp_path / "out"
    rc = cli.main(
        [str(src), "--tool", "unmicst-solo", "--model", "blobDemo",
         "--modelRoot", os.path.join(repo, "models"),
         "--outputPath", str(out), "--stackOutput"]
    )
    assert rc == 0
    assert num_pages(str(out / "img_Probabilities_1.tif")) == 3


def test_cli_solo_nd2_end_to_end(tmp_path, rng):
    import os

    from unmicst_tpu import cli
    from unmicst_tpu.io.tiff import num_pages

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    frame = (rng.rand(90, 110, 2) * 60000).astype(np.uint16)
    src = tmp_path / "s" / "registration" / "img.nd2"
    src.parent.mkdir(parents=True)
    write_nd2(str(src), [frame])
    out = tmp_path / "out"
    rc = cli.main(
        [str(src), "--tool", "unmicst-solo", "--model", "blobDemo",
         "--modelRoot", os.path.join(repo, "models"),
         "--outputPath", str(out), "--channel", "2", "--stackOutput"]
    )
    assert rc == 0
    assert num_pages(str(out / "img_Probabilities_2.tif")) == 3


def test_czi_pyramid_levels_skipped(tmp_path, rng):
    """Pyramid/downsampled sub-blocks share the full-res C/S/T/Z coords;
    they must not overwrite real pixels (r2 review fix)."""
    plane = (rng.rand(24, 40) * 60000).astype(np.uint16)
    down = plane[::2, ::2].copy()
    path = str(tmp_path / "p.czi")
    # hand-assemble: one full-res block + one pyramid block (PyramidType=1,
    # StoredSize half of logical Size)
    blocks = [
        ({"X": (0, 40, 40), "Y": (0, 24, 24), "C": (0, 1, 1)}, plane, 0),
        ({"X": (0, 40, 20), "Y": (0, 24, 12), "C": (0, 1, 1)}, down, 1),
    ]

    def entry3(pixel_type, file_pos, compression, dims, pyramid):
        out = b"DV" + struct.pack("<iqii", pixel_type, file_pos, 0, compression)
        out += bytes([pyramid]) + b"\x00" * 5
        out += struct.pack("<i", len(dims))
        for name, (start, size, stored) in dims.items():
            out += struct.pack("<4siifi", name.encode(), start, size,
                               float(start), stored)
        return out

    file_header = struct.pack("<ii8x16s16si", 1, 0, b"\x00" * 16,
                              b"\x00" * 16, 0)
    out = bytearray()
    out += _segment(b"ZISRAWFILE",
                    file_header + struct.pack("<qqiq", 0, 0, 0, 0))
    positions = []
    for dims, pix, pyr in blocks:
        positions.append(len(out))
        e = entry3(1, 0, 0, dims, pyr)
        head = struct.pack("<iiq", 0, 0, pix.nbytes) + e
        payload = head + b"\x00" * (max(256, len(e) + 16) - len(head))
        payload += pix.astype("<u2").tobytes()
        out += _segment(b"ZISRAWSUBBLOCK", payload)
    dir_pos = len(out)
    dp = struct.pack("<i", len(blocks)) + b"\x00" * 124
    for (dims, _, pyr), pos in zip(blocks, positions):
        dp += entry3(1, pos, 0, dims, pyr)
    out += _segment(b"ZISRAWDIRECTORY", dp)
    struct.pack_into("<q", out, 32 + 52, dir_pos)
    with open(path, "wb") as f:
        f.write(out)

    got = read_czi_channel(path, 0)
    np.testing.assert_array_equal(got, plane)


def test_nd2_prefix_key_disambiguation(tmp_path, rng):
    """uiWidthBytes serialized BEFORE uiWidth must not shadow it (the LV
    scan iterates occurrences and validity-filters; r2 review fix)."""
    frame = (rng.rand(18, 26, 1) * 60000).astype(np.uint16)
    attrs = (
        _lv_uint("uiWidthBytes", 26 * 2)
        + _lv_uint("uiWidth", 26) + _lv_uint("uiHeight", 18)
        + _lv_uint("uiComp", 1) + _lv_uint("uiBpcInMemory", 16)
    )
    path = str(tmp_path / "w.nd2")
    out = bytearray()
    offsets = {b"ImageAttributesLV!": 0}
    out += _nd2_chunk(b"ImageAttributesLV!", attrs)
    offsets[b"ImageDataSeq|0!"] = len(out)
    out += _nd2_chunk(b"ImageDataSeq|0!",
                      struct.pack("<d", 0.0) + frame.astype("<u2").tobytes())
    map_data = b"".join(
        nm + struct.pack("<QQ", off, 0) for nm, off in offsets.items()
    ) + b"ND2 CHUNK MAP SIGNATURE 0000001!" + struct.pack("<QQ", 0, 0)
    map_pos = len(out)
    out += _nd2_chunk(b"ND2 CHUNK MAP SIGNATURE 0000001!", map_data)
    out += b"ND2 CHUNK MAP SIGNATURE 0000001!" + struct.pack("<Q", map_pos)
    with open(path, "wb") as f:
        f.write(out)

    with Nd2File(path) as nd2:
        assert (nd2.width, nd2.height) == (26, 18)
    np.testing.assert_array_equal(read_nd2_channel(path, 0), frame[:, :, 0])


def test_reader_constructors_close_on_error(tmp_path):
    """Failed header validation must not leak the file handle."""
    import warnings

    bad = str(tmp_path / "bad.bin")
    with open(bad, "wb") as f:
        f.write(b"\x00" * 256)
    with warnings.catch_warnings():
        warnings.simplefilter("error", ResourceWarning)
        for ctor in (CziFile, Nd2File):
            with pytest.raises(ValueError):
                ctor(bad)
            import gc

            gc.collect()  # a leaked handle would raise ResourceWarning here


def test_windowed_reads_match_full_plane(tmp_path, rng):
    """read_rows windows reassemble the full channel plane (czi mosaic +
    nd2 multicomponent), incl. zero-padding outside."""
    from unmicst_tpu.io.slides import open_channel_source

    plane = (rng.rand(37, 52) * 60000).astype(np.uint16)
    czi_path = str(tmp_path / "w.czi")
    write_czi(czi_path, [plane], tile_split=20)
    frame = (rng.rand(37, 52, 2) * 60000).astype(np.uint16)
    nd2_path = str(tmp_path / "w.nd2")
    write_nd2(nd2_path, [frame])

    for path, ftype, expect in ((czi_path, "czi", plane),
                                (nd2_path, "nd2", frame[:, :, 0])):
        with open_channel_source(path, ftype, 0) as src:
            assert (src.height, src.width) == expect.shape
            got = np.concatenate(
                [src.read_rows(r, 7) for r in range(0, 37, 7)]
            )[:37]
            np.testing.assert_array_equal(got, expect)
            # outside rows zero-pad
            assert src.read_rows(-3, 3).sum() == 0
            assert src.read_rows(37, 2).sum() == 0
            lo, hi = src.stats(-1)
            assert lo == expect.min() and hi == expect.max()
            _, pct = src.stats(98.5)
            assert abs(pct - np.percentile(expect, 98.5)) < 1e-9


def test_cli_streaming_czi_matches_whole(tmp_path, rng):
    """--engine streaming on a CZI mosaic == the whole-image engine."""
    import os

    from unmicst_tpu import cli
    from unmicst_tpu.io.tiff import imread

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plane = (rng.rand(150, 120) * 60000).astype(np.uint16)
    src = tmp_path / "s" / "registration" / "img.czi"
    src.parent.mkdir(parents=True)
    write_czi(str(src), [plane], tile_split=64)
    common = [str(src), "--tool", "unmicst-solo", "--model", "blobDemo",
              "--modelRoot", os.path.join(repo, "models"), "--stackOutput"]
    assert cli.main(common + ["--outputPath", str(tmp_path / "w"),
                              "--engine", "whole"]) == 0
    assert cli.main(common + ["--outputPath", str(tmp_path / "s2"),
                              "--engine", "streaming"]) == 0
    for k in range(3):
        a = imread(str(tmp_path / "w" / "img_Probabilities_1.tif"), k)
        b = imread(str(tmp_path / "s2" / "img_Probabilities_1.tif"), k)
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_readers_survive_fuzz(tmp_path, rng):
    """Random mutations/truncations of valid containers raise clean errors
    (ValueError/NotImplementedError/Index/EOF-ish) — never hang, never
    allocate from garbage headers, never escape with weird exceptions."""
    plane = (rng.rand(16, 24) * 60000).astype(np.uint16)
    czi_ok = tmp_path / "ok.czi"
    write_czi(str(czi_ok), [plane])
    frame = (rng.rand(16, 24, 1) * 60000).astype(np.uint16)
    nd2_ok = tmp_path / "ok.nd2"
    write_nd2(str(nd2_ok), [frame])
    sources = [(czi_ok, read_czi_channel), (nd2_ok, read_nd2_channel)]
    try:  # compressed sub-block path fuzzes too when a backend exists
        import zstandard  # noqa: F401

        czi_z = tmp_path / "okz.czi"
        write_czi(str(czi_z), [plane], compression=6, hilo=True)
        sources.append((czi_z, read_czi_channel))
    except ImportError:
        pass
    allowed = (ValueError, NotImplementedError, IndexError, KeyError,
               struct.error, EOFError, OSError)
    r = np.random.RandomState(7)
    for src, reader in sources:
        blob = bytearray(open(src, "rb").read())
        for trial in range(60):
            mutated = bytearray(blob)
            if trial % 3 == 0:  # truncate
                mutated = mutated[: r.randint(1, len(blob))]
            else:  # corrupt a few bytes
                for _ in range(r.randint(1, 6)):
                    mutated[r.randint(0, len(mutated))] = r.randint(0, 256)
            path = str(tmp_path / f"f{trial}{src.suffix}")
            with open(path, "wb") as f:
                f.write(mutated)
            try:
                out = reader(path, 0)
                assert out.size <= 1 << 34  # guarded allocation
            except allowed:
                pass


def test_preview_u8_lut_matches_float(tmp_path, rng):
    """The integer-LUT preview equals the per-pixel float32 formula."""
    from unmicst_tpu.io.slides import ChannelSource, preview_u8

    plane = (rng.rand(50, 60) * 60000).astype(np.uint16)
    src = ChannelSource(50, 60, np.uint16,
                        lambda r0, n: plane[r0 : r0 + n])
    got = preview_u8(src)
    vmax = float(plane.max())
    expect = np.uint8(255 * (plane.astype(np.float32) / vmax))
    np.testing.assert_array_equal(got, expect)


def test_preview_u8_int16_negatives_clamp(rng):
    """int16 sources: negatives clamp to 0 instead of uint8 wraparound,
    and positives match the float formula (ADVICE r2 slides.py:180)."""
    from unmicst_tpu.io.slides import ChannelSource, preview_u8

    plane = (rng.rand(20, 30) * 4000 - 1000).astype(np.int16)
    plane[0, 0] = -32768  # extreme negative must still be 0
    src = ChannelSource(20, 30, np.int16,
                        lambda r0, n: plane[r0 : r0 + n])
    got = preview_u8(src)
    vmax = float(plane.max())
    expect = np.uint8(
        255 * np.clip(plane.astype(np.float32) / vmax, 0.0, 1.0)
    )
    np.testing.assert_array_equal(got, expect)
    assert got[plane < 0].max(initial=0) == 0

    # vmax pass-through (offset-corrected stats max) takes the same path
    got2 = preview_u8(src, vmax=vmax)
    np.testing.assert_array_equal(got2, expect)


# ---------------------------------------------------------------------------
# JPEG XR sub-blocks (io/jxr.py: optional imagecodecs backend)
# ---------------------------------------------------------------------------


class _StubImagecodecs:
    """Implements the exact backend API (imagecodecs.jpegxr_decode) over
    npy-serialized payloads, so every layer of our plumbing — sub-block
    extraction, payload hand-off, dtype/shape validation, windowed row
    reads, block cache — runs unchanged; a real imagecodecs install
    swaps only the codec."""

    @staticmethod
    def jpegxr_decode(buf):
        import io as _io

        return np.load(_io.BytesIO(bytes(buf)))


def _npy_bytes(arr):
    import io as _io

    b = _io.BytesIO()
    np.save(b, arr)
    return b.getvalue()


@pytest.fixture
def stub_jxr(monkeypatch):
    import sys

    from unmicst_tpu.io import jxr

    monkeypatch.setitem(sys.modules, "imagecodecs", _StubImagecodecs())
    jxr.reset_backend_cache()
    yield
    jxr.reset_backend_cache()


def test_czi_jxr_subblocks_decode(tmp_path, rng, stub_jxr):
    from unmicst_tpu.io.czi import CziFile

    planes = [(rng.rand(40, 60) * 60000).astype(np.uint16) for _ in range(2)]
    path = str(tmp_path / "jxr.czi")
    blocks = [(dict(X=(0, 60), Y=(0, 40), C=(c, 1)), _npy_bytes(p))
              for c, p in enumerate(planes)]
    _write_czi_blocks(path, blocks, pixel_type=1, compression=4)
    with CziFile(path) as cz:
        assert cz.channels() == 2
        for c, plane in enumerate(planes):
            np.testing.assert_array_equal(cz.read_channel(c), plane)
    # streaming source path
    from unmicst_tpu.io.slides import open_channel_source

    with open_channel_source(path, "czi", 1) as src:
        np.testing.assert_array_equal(src.read_rows(7, 21), planes[1][7:28])


def test_czi_jxr_without_backend_errors_precisely(tmp_path, rng):
    import sys

    from unmicst_tpu.io import jxr
    from unmicst_tpu.io.czi import CziFile

    plane = (rng.rand(8, 8) * 100).astype(np.uint16)
    path = str(tmp_path / "jxr2.czi")
    _write_czi_blocks(
        path, [(dict(X=(0, 8), Y=(0, 8), C=(0, 1)), _npy_bytes(plane))],
        pixel_type=1, compression=4,
    )
    assert "imagecodecs" not in sys.modules or not hasattr(
        sys.modules["imagecodecs"], "jpegxr_decode"
    )
    jxr.reset_backend_cache()
    with CziFile(path) as cz:
        with pytest.raises(NotImplementedError) as ei:
            cz.read_channel(0)
    msg = str(ei.value)
    assert "imagecodecs" in msg and "jxr2.czi" in msg


def test_czi_jxr_shape_mismatch_rejected(tmp_path, rng, stub_jxr):
    from unmicst_tpu.io.czi import CziFile

    plane = (rng.rand(8, 8) * 100).astype(np.uint16)
    path = str(tmp_path / "jxr3.czi")
    # directory says 8x8 but the payload decodes to 4x4
    _write_czi_blocks(
        path,
        [(dict(X=(0, 8), Y=(0, 8), C=(0, 1)), _npy_bytes(plane[:4, :4]))],
        pixel_type=1, compression=4,
    )
    with CziFile(path) as cz:
        with pytest.raises(ValueError, match="declares"):
            cz.read_channel(0)


# ---------------------------------------------------------------------------
# Adversarial container fixtures (r2 verdict #9: inputs the readers were
# NOT built around — until a vendor export is obtainable, stress the spec
# corners a real microscope can produce)
# ---------------------------------------------------------------------------


def test_czi_multi_scene_uses_first_scene_only(tmp_path, rng):
    """A second scene (S=1) at far X/Y offsets — listed FIRST in the
    directory — must neither displace scene 0's canvas nor overwrite its
    pixels (the reference extracts asarray()[0, ...]: first scene)."""
    s0 = (rng.rand(30, 40) * 60000).astype(np.uint16)
    s1 = (rng.rand(30, 40) * 60000).astype(np.uint16)
    path = str(tmp_path / "scenes.czi")
    blocks = [
        # adversarial order: scene 1 first
        (dict(X=(500, 40), Y=(700, 30), C=(0, 1), S=(1, 1)),
         s1.astype("<u2").tobytes()),
        (dict(X=(0, 40), Y=(0, 30), C=(0, 1), S=(0, 1)),
         s0.astype("<u2").tobytes()),
    ]
    _write_czi_blocks(path, blocks)
    with CziFile(path) as cz:
        got = cz.read_channel(0)
    np.testing.assert_array_equal(got, s0)


def test_czi_timepoints_pick_first(tmp_path, rng):
    """Two timepoints at the same X/Y: T=1 (listed first) must not
    overwrite T=0's pixels."""
    t0 = (rng.rand(20, 25) * 60000).astype(np.uint16)
    t1 = (rng.rand(20, 25) * 60000).astype(np.uint16)
    path = str(tmp_path / "timepoints.czi")
    blocks = [
        (dict(X=(0, 25), Y=(0, 20), C=(0, 1), T=(1, 1)),
         t1.astype("<u2").tobytes()),
        (dict(X=(0, 25), Y=(0, 20), C=(0, 1), T=(0, 1)),
         t0.astype("<u2").tobytes()),
    ]
    _write_czi_blocks(path, blocks)
    with CziFile(path) as cz:
        np.testing.assert_array_equal(cz.read_channel(0), t0)


def test_nd2_out_of_order_chunk_map(tmp_path, rng):
    """Frames stored physically in REVERSE order with shuffled map
    entries and a decoy unknown chunk between them: the reader must
    resolve every frame through the map, never by file position."""
    frames = [
        (rng.rand(16, 18, 2) * 60000).astype(np.uint16) for _ in range(3)
    ]
    h, w, comp = frames[0].shape
    attrs = (
        _lv_uint("uiWidth", w) + _lv_uint("uiHeight", h)
        + _lv_uint("uiComp", comp) + _lv_uint("uiBpcInMemory", 16)
    )
    out = bytearray()
    offsets = {}
    # frames physically reversed, decoy chunks interleaved
    for i in reversed(range(len(frames))):
        out += _nd2_chunk(b"CustomJunk|x!", b"\x42" * 17)
        name = f"ImageDataSeq|{i}!".encode()
        offsets[name] = len(out)
        data = struct.pack("<d", 0.0) + frames[i].astype("<u2").tobytes()
        out += _nd2_chunk(name, data)
    name = b"ImageAttributesLV!"
    offsets[name] = len(out)
    out += _nd2_chunk(name, attrs)  # attributes LAST physically
    # map entries in shuffled (not insertion) order
    items = list(offsets.items())
    items = items[1::2] + items[0::2]
    map_data = b"".join(
        nm + struct.pack("<QQ", off, 0) for nm, off in items
    ) + b"ND2 CHUNK MAP SIGNATURE 0000001!" + struct.pack("<QQ", 0, 0)
    map_pos = len(out)
    out += _nd2_chunk(b"ND2 CHUNK MAP SIGNATURE 0000001!", map_data)
    out += b"ND2 CHUNK MAP SIGNATURE 0000001!" + struct.pack("<Q", map_pos)
    path = str(tmp_path / "shuffled.nd2")
    with open(path, "wb") as f:
        f.write(bytes(out))

    for c in range(comp):
        np.testing.assert_array_equal(
            read_nd2_channel(path, c), frames[0][:, :, c]
        )
    with Nd2File(path) as nd:
        assert nd.n_frames == 3
        np.testing.assert_array_equal(
            nd.read_rows(1, 3, 7), frames[0][3:10, :, 1]
        )


def test_czi_jpeg_subblocks_decode(tmp_path, rng):
    """Plain-JPEG (compression=2) sub-blocks decode via PIL; lossy codec,
    so the fixture uses JPEG's own round-trip as truth (uint8 gray)."""
    import io as _io

    from PIL import Image

    from unmicst_tpu.io.czi import CziFile

    plane = (rng.rand(40, 60) * 255).astype(np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(plane, mode="L").save(buf, format="JPEG", quality=95)
    payload = buf.getvalue()
    expected = np.asarray(Image.open(_io.BytesIO(payload)))
    path = str(tmp_path / "jpeg.czi")
    # pixel_type 0 = Gray8
    _write_czi_blocks(
        path, [(dict(X=(0, 60), Y=(0, 40), C=(0, 1)), payload)],
        pixel_type=0, compression=2,
    )
    with CziFile(path) as cz:
        np.testing.assert_array_equal(cz.read_channel(0), expected)


def test_truncation_fuzz_all_containers(tmp_path, rng):
    """Every prefix-truncation and byte-corruption of a valid container
    must raise a clean Python exception — never hang, crash, or allocate
    unboundedly (the header-driven allocation guards).  Exercises TIFF
    (classic strip + deflate), CZI (zstd1 + mosaic), ND2."""
    from unmicst_tpu.io.czi import read_czi_channel
    from unmicst_tpu.io.nd2 import read_nd2_channel
    from unmicst_tpu.io.tiff import imread as tiff_imread
    from unmicst_tpu.io.tiff import imwrite as tiff_imwrite

    plane = (rng.rand(24, 31) * 60000).astype(np.uint16)
    paths = {}
    t = str(tmp_path / "t.tif")
    tiff_imwrite(t, plane, bigtiff=False, compression="deflate")
    paths[t] = lambda p: tiff_imread(p)
    c = str(tmp_path / "t.czi")
    write_czi(c, [plane], compression=6, hilo=True, tile_split=11)
    paths[c] = lambda p: read_czi_channel(p, 0)
    n = str(tmp_path / "t.nd2")
    write_nd2(n, [np.repeat(plane[:, :, None], 2, axis=2)])
    paths[n] = lambda p: read_nd2_channel(p, 0)

    fuzz = str(tmp_path / "fuzz.bin")
    frng = np.random.RandomState(1234)
    import warnings

    for path, reader in paths.items():
        with open(path, "rb") as f:
            blob = f.read()
        good = reader(path)  # sanity: the fixture itself reads
        assert good.shape == plane.shape
        cuts = sorted(set(
            [0, 1, 7, len(blob) - 1]
            + list(frng.randint(2, len(blob), 12))
        ))
        with warnings.catch_warnings():
            # PIL's fallback chatters UserWarnings on corrupt TIFF
            # metadata (expected here — we FEED it corrupt files);
            # ResourceWarnings stay fatal: an fd leak is a real bug
            warnings.simplefilter("ignore", UserWarning)
            warnings.simplefilter("error", ResourceWarning)
            for cut in cuts:
                with open(fuzz, "wb") as f:
                    f.write(blob[:cut])
                try:
                    reader(fuzz)
                except ResourceWarning:
                    raise
                except Exception as e:  # noqa: BLE001 — clean failure is the contract
                    assert not isinstance(e, (MemoryError, SystemError)), e
            for _ in range(12):
                corrupted = bytearray(blob)
                for pos in frng.randint(0, len(blob), 8):
                    corrupted[pos] ^= 0xFF
                with open(fuzz, "wb") as f:
                    f.write(bytes(corrupted))
                try:
                    out = reader(fuzz)
                    assert out.nbytes <= 1 << 26  # bounded even when "readable"
                except ResourceWarning:
                    raise
                except Exception as e:  # noqa: BLE001
                    assert not isinstance(e, (MemoryError, SystemError)), e


def test_czi_jxr_dtype_mismatch_rejected(tmp_path, rng, stub_jxr):
    """Directory declares Gray16 but the payload decodes to uint8."""
    from unmicst_tpu.io.czi import CziFile

    plane8 = (rng.rand(8, 8) * 100).astype(np.uint8)
    path = str(tmp_path / "jxr4.czi")
    _write_czi_blocks(
        path, [(dict(X=(0, 8), Y=(0, 8), C=(0, 1)), _npy_bytes(plane8))],
        pixel_type=1, compression=4,  # pixel_type 1 = Gray16
    )
    with CziFile(path) as cz:
        with pytest.raises(ValueError, match="declares"):
            cz.read_channel(0)


def test_czi_channel_names(tmp_path, rng):
    """channel_names() parses Image/Dimensions/Channels from the
    ZISRAWMETADATA segment; files without the segment return None;
    the CLI resolves --channelName through it end-to-end."""
    from unmicst_tpu.io.czi import CziFile
    from unmicst_tpu.io.slides import resolve_channel_names

    planes = [(rng.rand(40, 48) * 60000).astype(np.uint16)
              for _ in range(2)]
    p = str(tmp_path / "named.czi")
    write_czi(p, planes, channel_names=["DAPI", None])
    with CziFile(p) as cz:
        assert cz.channel_names() == ["DAPI", None]
    assert resolve_channel_names(p, "czi", ["DAPI"]) == [0]
    with pytest.raises(ValueError, match="DAPI"):
        resolve_channel_names(p, "czi", ["CD45"])
    # no metadata segment -> None / clean error
    q = str(tmp_path / "plain.czi")
    write_czi(q, planes)
    with CziFile(q) as cz:
        assert cz.channel_names() is None
    with pytest.raises(ValueError, match="no channel names"):
        resolve_channel_names(q, "czi", ["DAPI"])


@needs_reference
def test_cli_channel_name_czi(tmp_path, rng):
    """--channelName on a CZI equals the --channel index run
    bit-for-bit (real legacy weights)."""
    from unmicst_tpu import cli
    from unmicst_tpu.io.tiff import imread

    planes = [(rng.rand(160, 128) * 60000).astype(np.uint16)
              for _ in range(2)]
    p = str(tmp_path / "n.czi")
    write_czi(p, planes, channel_names=["junk", "DNA"])
    base = ["--tool", "unmicst-legacy", "--stackOutput",
            "--modelRoot", os.path.join(REFERENCE, "models")]
    assert cli.main([p, *base, "--outputPath", str(tmp_path / "a"),
                     "--channel", "2"]) == 0
    assert cli.main([p, *base, "--outputPath", str(tmp_path / "b"),
                     "--channelName", "DNA"]) == 0
    for k in range(3):
        np.testing.assert_array_equal(
            imread(str(tmp_path / "a" / "n_Probabilities_2.tif"), k),
            imread(str(tmp_path / "b" / "n_Probabilities_2.tif"), k),
        )
