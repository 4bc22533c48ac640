"""Seeded fuzz smoke + parser-hardening regressions.

The full campaign lives in ``scripts/fuzz_native_codec.py`` (run with
larger --n off-CI); this file pins a deterministic slice of both fuzz
modes plus named repros for the parser holes the first campaign found:
struct.error leaking from truncated headers/IFDs, MemoryError from
crafted tag counts, and a TypeError crash on tiled pages with missing
tile geometry.  Hostile-file handling matters because ``serve.py``
feeds uploaded container bytes straight into this parser.
"""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FUZZ = os.path.join(REPO, "scripts", "fuzz_native_codec.py")


def _run_fuzz(mode: str, n: int, seed: int) -> None:
    # one worker subprocess: crash isolation (a segfault in the native
    # lib must fail THIS test, not kill the pytest run)
    p = subprocess.run(
        [sys.executable, FUZZ, "--mode", mode, "--n", str(n),
         "--jobs", "1", "--seed", str(seed), "--timeout", "240"],
        capture_output=True, text=True, timeout=280,
    )
    assert p.returncode == 0, f"fuzz {mode} found failures:\n{p.stdout}"


@pytest.mark.slow
def test_codec_differential_fuzz_smoke():
    _run_fuzz("codec", 300, 77)


@pytest.mark.slow
def test_file_parse_fuzz_smoke():
    _run_fuzz("file", 60, 77)


@pytest.mark.slow
def test_container_parse_fuzz_smoke():
    _run_fuzz("container", 60, 77)


@pytest.mark.slow
def test_ckpt_parse_fuzz_smoke():
    _run_fuzz("ckpt", 80, 77)


@pytest.mark.slow
def test_query_param_fuzz_smoke():
    """Randomized /infer query strings against a live server: every
    response is 200 or 4xx, never 5xx (the range/roi/channel_name/...
    parser contract).  Engine builds need more than the default fuzz
    rlimit, so this mode runs with a 6 GiB cap."""
    p = subprocess.run(
        [sys.executable, FUZZ, "--mode", "query", "--n", "40",
         "--jobs", "1", "--seed", "77", "--timeout", "500",
         "--mem-gib", "6"],
        capture_output=True, text=True, timeout=560,
    )
    assert p.returncode == 0, f"query fuzz found failures:\n{p.stdout}"


def test_tf1_corrupt_bundle_raises_valueerror(tmp_path):
    """Fuzz repros for the TF1 table reader: truncated varints, block
    handles past EOF, corrupt dtype enums, and snappy copy offsets
    outside the output all leaked IndexError/struct.error/KeyError."""
    from unmicst_tpu.core.tf1_ckpt import (
        TF1Checkpoint, _read_block, _snappy_decompress, _varint,
        write_tf1_checkpoint,
    )

    with pytest.raises(ValueError, match="truncated varint"):
        _varint(b"\xff\xff", 0)
    with pytest.raises(ValueError, match="block handle"):
        _read_block(b"short", 3, 40)
    with pytest.raises(ValueError, match="offset outside"):
        _snappy_decompress(b"\x04\x01\x09")  # copy before any output
    prefix = str(tmp_path / "model.ckpt")
    write_tf1_checkpoint(
        prefix, {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    )
    # truncate the index: parse must fail as ValueError
    idx = prefix + ".index"
    blob = open(idx, "rb").read()
    open(idx, "wb").write(blob[: len(blob) // 2] + blob[-48:])
    with pytest.raises(ValueError):
        TF1Checkpoint(prefix)


def test_fuzz_lzw_encoder_matches_decoders():
    """The harness's own TIFF-LZW encoder must agree with BOTH in-repo
    decoders across the 9->10->11->12-bit width boundaries and the
    table-full clear (regression: early-change off-by-one)."""
    sys.path.insert(0, REPO)
    from scripts.fuzz_native_codec import gen_payload, lzw_encode
    from unmicst_tpu.io import _native, tiff

    rng = np.random.RandomState(11)
    plain = b""
    while len(plain) < 150_000:  # enough entries to force a table clear
        plain += gen_payload(rng, int(rng.randint(0, 4)))
    enc = lzw_encode(plain)
    assert tiff._unpack_lzw(enc) == plain
    out = _native.lzw_decode(enc, len(plain))
    if out is not None:  # native lib present
        assert out.tobytes() == plain


def test_decode_ex_reports_overrun():
    """The _ex decoders report an overrun flag — capacity reached while
    the stream demonstrably encoded more output — making writer padding
    distinguishable from over-long/corrupt final strips (ADVICE r4).
    Trailing EOI / zero-bit / 0x80-no-op padding is NOT an overrun."""
    sys.path.insert(0, REPO)
    from scripts.fuzz_native_codec import gen_payload, lzw_encode, \
        packbits_encode
    from unmicst_tpu.io import _native

    rng = np.random.RandomState(7)
    plain = bytes(gen_payload(rng, 2))[:20_000]

    enc = packbits_encode(plain)
    r = _native.packbits_decode_ex(enc, len(plain))
    if r is None:
        pytest.skip("native lib absent")
    out, over = r
    assert out.tobytes() == plain and not over
    # exact fill + no-op padding: clean
    out, over = _native.packbits_decode_ex(enc + b"\x80" * 8, len(plain))
    assert out.tobytes() == plain and not over
    # over-long: half the declared capacity stops mid-stream
    out, over = _native.packbits_decode_ex(enc, len(plain) // 2)
    assert len(out) == len(plain) // 2 and over
    assert out.tobytes() == plain[: len(plain) // 2]
    # exact fill + MORE data chunks: overrun even without mid-chunk cut
    out, over = _native.packbits_decode_ex(enc + b"\x00A", len(plain))
    assert out.tobytes() == plain and over

    enc = lzw_encode(plain)
    out, over = _native.lzw_decode_ex(enc, len(plain))
    assert out.tobytes() == plain and not over
    # trailing byte padding after EOI: clean
    out, over = _native.lzw_decode_ex(enc + b"\0" * 64, len(plain))
    assert out.tobytes() == plain and not over
    # capacity-stop mid-stream: overrun
    out, over = _native.lzw_decode_ex(enc, len(plain) // 2)
    assert len(out) == len(plain) // 2 and over
    assert out.tobytes() == plain[: len(plain) // 2]
    # single-run RLE truncation (the mid-run case a consumed-bytes
    # report cannot see): 25 repeats declared as 12
    enc1 = packbits_encode(b"\xf6" * 25)
    out, over = _native.packbits_decode_ex(enc1, 12)
    assert out.tobytes() == b"\xf6" * 12 and over


# ---------------------------------------------------------- named repros
def test_truncated_header_raises_valueerror(tmp_path):
    from unmicst_tpu.io.tiff import TiffFile

    for blob in (b"II", b"II*", b"II*\0", b"MM\0+", b"MM\0+\0\x08"):
        p = tmp_path / "t.tif"
        p.write_bytes(blob)
        with pytest.raises(ValueError):
            TiffFile(str(p))


def test_truncated_ifd_raises_valueerror(tmp_path):
    from unmicst_tpu.io.tiff import TiffFile

    # classic header pointing at an IFD that sits at EOF
    p = tmp_path / "t.tif"
    p.write_bytes(struct.pack("<2sHI", b"II", 42, 8) + b"\x03\0")
    with pytest.raises(ValueError, match="IFD"):
        TiffFile(str(p))
    # IFD claiming more entries than the file can hold
    p.write_bytes(struct.pack("<2sHI", b"II", 42, 8)
                  + struct.pack("<H", 0xFFFF) + b"\0" * 32)
    with pytest.raises(ValueError):
        TiffFile(str(p))


def test_crafted_tag_count_does_not_allocate(tmp_path):
    """A tag whose count*size exceeds the file must be treated as absent
    (never an fh.read of gigabytes -> MemoryError)."""
    from unmicst_tpu.io.tiff import TiffFile

    # one IFD, one LONG tag (ImageWidth) with count 2^30 pointing at 8
    hdr = struct.pack("<2sHI", b"II", 42, 8)
    ent = struct.pack("<HHII", 256, 4, 1 << 30, 8)
    ifd = struct.pack("<H", 1) + ent + struct.pack("<I", 0)
    p = tmp_path / "t.tif"
    p.write_bytes(hdr + ifd)
    with pytest.raises(ValueError, match="missing dimensions"):
        TiffFile(str(p))


def test_tiled_page_missing_geometry_raises(tmp_path):
    """TileOffsets without TileWidth/TileLength/TileByteCounts used to
    crash with TypeError (None arithmetic) in the region reader."""
    from unmicst_tpu.io.tiff import TiffFile

    hdr = struct.pack("<2sHI", b"II", 42, 8)

    def ent(tag, ftype, count, val):
        return struct.pack("<HHII", tag, ftype, count, val)

    entries = [
        ent(256, 4, 1, 64), ent(257, 4, 1, 64),  # 64x64
        ent(324, 4, 1, 200),                     # TileOffsets, no dims
    ]
    ifd = (struct.pack("<H", len(entries)) + b"".join(entries)
           + struct.pack("<I", 0))
    p = tmp_path / "t.tif"
    p.write_bytes(hdr + ifd + b"\0" * 64)
    with pytest.raises(ValueError, match="tile"):
        TiffFile(str(p))


def test_czi_truncated_structures_raise_valueerror(tmp_path):
    """Fuzz repros: short file header, crafted directory count, crafted
    dim_count, and an entry missing X/Y all leaked struct.error or
    KeyError before the hardening pass."""
    from tests.test_slides_czi_nd2 import _dir_entry, _segment
    from unmicst_tpu.io.czi import CziFile, _parse_directory_entry

    # file header payload shorter than the 60 bytes the dir-pos needs
    p = tmp_path / "t.czi"
    p.write_bytes(_segment(b"ZISRAWFILE", b"\x00" * 40))
    with pytest.raises(ValueError, match="truncated CZI file header"):
        CziFile(str(p))
    # truncated directory entry buffer
    with pytest.raises(ValueError, match="truncated CZI directory entry"):
        _parse_directory_entry(b"DV" + b"\x00" * 10, 0)
    # crafted dim_count pointing past the buffer
    ent = bytearray(_dir_entry(1, 0, 0, {"X": (0, 8), "Y": (0, 8)}))
    ent[28:32] = struct.pack("<i", 1000)
    with pytest.raises(ValueError, match="dimensions"):
        _parse_directory_entry(bytes(ent), 0)
    # entry with no Y dimension: plane-shape math must not KeyError
    import numpy as np

    from tests.test_slides_czi_nd2 import _write_czi_blocks

    blocks = [({"X": (0, 8), "C": (0, 1)},
               np.zeros(8, "<u2").tobytes())]
    q = tmp_path / "noy.czi"
    _write_czi_blocks(str(q), blocks)
    with CziFile(str(q)) as cz:
        with pytest.raises(ValueError, match="lacks the Y dimension"):
            cz.channel_shape(0)


def test_crafted_page_metadata_fails_cleanly(tmp_path):
    """Second fuzz round: crafted BitsPerSample/SampleFormat leaked
    numpy TypeError/KeyError from the dtype property; count=0 tags
    leaked IndexError; mismatched Strip arrays indexed [-1] on empty;
    a crafted strip byte count allocated before the EOF check."""
    import numpy as np

    from unmicst_tpu.io.tiff import TiffFile, TiffWriter

    img = np.arange(64 * 48, dtype=np.uint8).reshape(64, 48)
    base = str(tmp_path / "b.tif")
    with TiffWriter(base, bigtiff=False) as w:
        w.write(img)
    raw = open(base, "rb").read()

    def patch_tag(data, tag, ftype=None, count=None, value=None):
        # classic TIFF: walk the first IFD and rewrite one entry
        b = bytearray(data)
        (ifd,) = struct.unpack_from("<I", b, 4)
        (n,) = struct.unpack_from("<H", b, ifd)
        for i in range(n):
            e = ifd + 2 + 12 * i
            t, ft = struct.unpack_from("<HH", b, e)
            if t == tag:
                if ftype is not None:
                    struct.pack_into("<H", b, e + 2, ftype)
                if count is not None:
                    struct.pack_into("<I", b, e + 4, count)
                if value is not None:
                    struct.pack_into("<I", b, e + 8, value)
                return bytes(b)
        raise AssertionError(f"tag {tag} not in fixture")

    # exotic BitsPerSample -> NotImplementedError (not np TypeError)
    p = tmp_path / "bits.tif"
    p.write_bytes(patch_tag(raw, 258, value=40056))
    with TiffFile(str(p)) as tf:
        with pytest.raises(NotImplementedError):
            tf.read_page(0)
    # SampleFormat outside {1,2,3} -> NotImplementedError (not KeyError)
    p.write_bytes(patch_tag(patch_tag(raw, 258, value=16),
                            339, value=9, ftype=3, count=1))
    with TiffFile(str(p)) as tf:
        with pytest.raises(NotImplementedError):
            tf.read_page(0)
    # count=0 width tag -> treated as absent -> missing dimensions
    p.write_bytes(patch_tag(raw, 256, count=0))
    with pytest.raises(ValueError, match="missing dimensions"):
        TiffFile(str(p))
    # StripByteCounts count=0 -> length-mismatch ValueError (not [-1])
    p.write_bytes(patch_tag(raw, 279, count=0))
    with pytest.raises(ValueError, match="length mismatch"):
        TiffFile(str(p))
    # strip byte count far past EOF on a compressed page -> ValueError
    # before fh.read allocates the crafted size (uncompressed pages read
    # only the geometry-derived span, so they stay unaffected)
    zbase = str(tmp_path / "z.tif")
    with TiffWriter(zbase, bigtiff=False, compression="deflate") as w:
        w.write(img)
    p.write_bytes(patch_tag(open(zbase, "rb").read(), 279,
                            value=1 << 30))
    with TiffFile(str(p)) as tf:
        with pytest.raises(ValueError, match="past EOF|truncated"):
            tf.read_page(0)


def test_valid_files_still_parse(tmp_path):
    """Hardening must not reject anything the writer produces."""
    from unmicst_tpu.io.tiff import TiffFile, TiffWriter

    img = (np.arange(97 * 131, dtype=np.uint16).reshape(97, 131)
           * 7 % 1024).astype(np.uint16)
    for name, kw, comp in [("a.tif", {}, None), ("b.tif", {}, "deflate"),
                           ("c.tif", {"tile": (32, 32)}, None),
                           ("d.tif", None, None)]:
        path = str(tmp_path / name)
        with TiffWriter(path, compression=comp) as w:
            if kw is None:
                w.write_pyramid(img, min_size=24)
            else:
                w.write(img, **kw)
        with TiffFile(path) as tf:
            assert (tf.read_page(0) == img).all()


def test_ome_xml_entity_bomb_is_safe():
    """A billion-laughs DTD in an OME description must not hang or
    exhaust memory in plane_index (hostile uploads carry descriptions;
    empirically expat does not amplify here — pin that)."""
    import time

    from unmicst_tpu.io import ome

    ents = ['<!ENTITY lol "lol">']
    for i in range(2, 12):
        ents.append(f'<!ENTITY lol{i} "' + f'&lol{i-1};' * 10 + '">')
    bomb = ('<?xml version="1.0"?><!DOCTYPE lolz [' + "".join(ents) + ']>'
            '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
            '<Image ID="&lol11;"><Pixels DimensionOrder="XYZCT" SizeC="2" '
            'SizeZ="1" SizeT="1"/></Image></OME>')
    t0 = time.time()
    try:
        ome.plane_index(bomb, 0, 4)  # either parses or rejects cleanly
    except (ValueError, IndexError):
        pass
    assert time.time() - t0 < 10


def test_tpu_queue_runner_journals(tmp_path, monkeypatch):
    """The on-chip queue runner executes steps in order, journals rc and
    output tail, and keeps going after a failing step."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import importlib

    tq = importlib.import_module("tpu_queue")
    ok = tmp_path / "ok.py"
    ok.write_text("print('step ok')\n")
    bad = tmp_path / "bad.py"
    bad.write_text("import sys; print('boom'); sys.exit(5)\n")
    monkeypatch.setattr(tq, "STEPS", [
        ("good", "stdin", str(ok), 60),
        ("bad", "stdin", str(bad), 60),
        ("after", "stdin", str(ok), 60),
    ])
    monkeypatch.setattr(tq, "JOURNAL", str(tmp_path / "j.json"))
    monkeypatch.setattr(sys, "argv", ["tpu_queue.py", "--skip-probe"])
    assert tq.main() == 1  # one failing step
    import json as _json

    j = _json.load(open(tmp_path / "j.json"))
    names = [s["step"] for s in j["steps"]]
    assert names == ["good", "bad", "after"]
    assert [s["rc"] for s in j["steps"]] == [0, 5, 0]
    assert "boom" in j["steps"][1]["tail"]
