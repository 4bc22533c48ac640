"""Differential fuzz harness for the native TIFF codec stack.

The server (`serve.py`) feeds arbitrary uploaded container bytes into
`io/tiff.py`, which hands strip/tile payloads to the native C++ codecs
(`native/tiffcodec.cpp`).  This harness hammers that surface two ways:

* ``--mode codec`` — codec-level differential fuzz: generate valid
  streams (own TIFF-LZW / PackBits encoders, zlib for deflate), mutate
  a fraction, and run the native decoder against the pure-Python
  oracle (`tiff._unpack_lzw` / `_unpack_packbits` / `zlib`).
  Properties enforced per case:
    - native never crashes, hangs, or writes outside its buffer
      (canary bytes checked after every call);
    - when BOTH native and oracle accept, the bytes are identical;
    - native-accepts-but-oracle-rejects is a finding (the fallback
      chain in `_decode` assumes native is the stricter one);
    - round-trips: `deflate`/`deflate_chain` output must inflate (via
      zlib AND native) back to the input;
    - `decode_strips` decodes a multi-strip span identically to
      per-strip calls and reports the first bad strip on corruption.
* ``--mode file`` — file-level fuzz of the server-reachable parse
  chain: write valid TIFFs (TiffWriter: deflate/zstd/lzma/none, tiled,
  pyramid; PIL: LZW/PackBits 8-row strips), mutate bytes, and call
  ``TiffFile.read``.  Property: a mutated file either parses or raises
  one of the CONTRACT exception types — never a segfault, hang,
  unbounded allocation, or an internal-type leak (struct.error,
  IndexError, KeyError, ...).

Workers run in subprocesses with RLIMIT_AS (default 2 GiB) and an
alarm, so a crash/hang/OOM in the native code is contained and
reported instead of killing the driver.  Failures are written as repro
JSON (hex payload + case parameters) under ``--out``.

* ``--mode container`` — same property over the CZI/ND2 parse chain
  (serve magic-sniffs uploads, so those parsers see hostile bytes
  too), entering through ``slides.read_channel`` exactly as the
  server does.  IndexError is additionally allowed (the documented
  out-of-range-channel contract).

* ``--mode query`` — randomized query strings against a LIVE server
  (the /infer parameter parsers: channel/channel_name/roi/range/scale/
  outlier/probe/...).  Property: any request answers 200 or 4xx JSON —
  never a 5xx or transport failure.

Usage:
    python scripts/fuzz_native_codec.py --mode codec     --n 4000 --seed 1
    python scripts/fuzz_native_codec.py --mode file      --n 300  --seed 1
    python scripts/fuzz_native_codec.py --mode container --n 300  --seed 1
    python scripts/fuzz_native_codec.py --mode query     --n 300  --seed 1 --jobs 1 --mem-gib 6

The pytest smoke (`tests/test_fuzz_native.py`) runs a small seeded
slice of every mode on each CI run.
"""

from __future__ import annotations

import argparse
import json
import os
import struct
import subprocess
import sys
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CANARY = 0xA5
SLACK = 4096  # canary region past the declared output capacity

# Exception types a hostile file may legitimately surface from
# TiffFile.read / imread.  Anything else is a contract violation.
FILE_CONTRACT = (
    "ValueError", "PageTooLargeError", "NotImplementedError",
    "EOFError", "OSError",
)


# ---------------------------------------------------------------- encoders
def lzw_encode(data: bytes, eoi_width: str = "spec") -> bytes:
    """Minimal TIFF-flavor LZW encoder (MSB-first, early change) used to
    mint valid streams for the decoder fuzz.  Matches the TIFF 6.0 spec
    the decoders implement (reference behavior: tifffile's encoder).

    ``eoi_width``: the final flush code erases the decoder's one-entry
    table lag, so when it lands exactly on an early-change boundary the
    EOI must be written one bit wider ("spec").  "lagged" skips that
    bump — the classic encoder off-by-one; such files exist in the wild
    and decoders are expected to stop at the declared output size
    instead of parsing the (misaligned) EOI.  The first fuzz campaign
    with streams crossing this boundary caught all three of our decode
    paths on it."""
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def put(code: int, nbits: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << nbits) | code
        bitcnt += nbits
        while bitcnt >= 8:
            bitcnt -= 8
            out.append((bitbuf >> bitcnt) & 0xFF)

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    nbits = 9
    put(256, nbits)  # clear
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        put(table[w], nbits)
        if next_code < 4094:
            table[wc] = next_code
            next_code += 1
            # early change: the decoder's table lags the encoder's by
            # exactly one entry, and the decoder bumps its read width
            # at next_code_dec >= 2^n - 1 — so the encoder bumps its
            # WRITE width at next_code_enc >= 2^n (one later)
            if next_code >= (1 << nbits) and nbits < 12:
                nbits += 1
        else:  # table full: clear and restart
            put(256, nbits)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            nbits = 9
        w = bytes([b])
    if w:
        put(table[w], nbits)
        # the decoder appends an entry for this code (its lag vanishes)
        if (eoi_width == "spec" and next_code >= (1 << nbits) - 1
                and nbits < 12):
            nbits += 1
    put(257, nbits)  # EOI
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Simple run-length PackBits encoder (valid-stream generator)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
        else:
            j = i + 1
            while (j < n and j - i < 128
                   and not (j + 1 < n and data[j] == data[j + 1])):
                j += 1
            out.append(j - i - 1)
            out += data[i:j]
            i = j
    return bytes(out)


# ---------------------------------------------------------------- generators
def gen_payload(rng, kind: int) -> bytes:
    """Raw plaintext classes: random, smooth image-like, repetitive,
    sparse — the distributions the codecs actually see."""
    import numpy as np

    n = int(rng.randint(0, 1 << rng.randint(1, 16)))
    if kind == 0:
        return bytes(rng.bytes(n))
    if kind == 1:  # smooth gradient + noise (probability-map-like)
        x = np.linspace(0, rng.randint(1, 30), n)
        v = (np.sin(x) * 100 + 128 + rng.randn(n) * rng.randint(0, 8))
        return np.clip(v, 0, 255).astype(np.uint8).tobytes()
    if kind == 2:  # long runs
        runs = []
        while sum(len(r) for r in runs) < n:
            runs.append(bytes([rng.randint(0, 256)])
                        * int(rng.randint(1, 400)))
        return b"".join(runs)[:n]
    return bytes(np.zeros(n, np.uint8))  # all-zero (deflate-degenerate)


def mutate(rng, data: bytes) -> bytes:
    """Byte flips, truncation, extension, splices — classic dumb fuzz."""
    if not data:
        return bytes(rng.bytes(rng.randint(1, 64)))
    b = bytearray(data)
    for _ in range(int(rng.randint(1, 8))):
        op = rng.randint(0, 4)
        if op == 0:  # flip
            b[rng.randint(0, len(b))] ^= 1 << rng.randint(0, 8)
        elif op == 1 and len(b) > 1:  # truncate
            del b[rng.randint(1, len(b)):]
        elif op == 2:  # extend
            b += bytes(rng.bytes(rng.randint(1, 64)))
        else:  # splice
            i = rng.randint(0, len(b))
            b[i:i] = bytes(rng.bytes(rng.randint(1, 16)))
    return bytes(b)


# ---------------------------------------------------------------- codec mode
def _native_call(fn, data: bytes, declared: int):
    """Run a native decode into a canary-padded buffer; returns
    (status, out_bytes) with status in {'ok', 'reject'}.  Raises
    RuntimeError on canary stomp (OOB write)."""
    import ctypes

    import numpy as np

    from unmicst_tpu.io import _native

    lib = _native.get_lib()
    assert lib is not None, "native lib must be built for the fuzz"
    buf = np.full(declared + SLACK, CANARY, np.uint8)
    n = fn(lib)(data, len(data), buf.ctypes.data_as(ctypes.c_void_p),
                declared)
    tail = buf[declared:]
    if not (tail == CANARY).all():
        raise RuntimeError(
            f"OOB WRITE: {int((tail != CANARY).sum())} canary bytes "
            f"stomped past dst_cap={declared}"
        )
    if n < 0:
        return "reject", b""
    if n > declared:
        raise RuntimeError(f"returned length {n} > dst_cap {declared}")
    return "ok", buf[:n].tobytes()


def codec_case(rng, case_id: int) -> dict | None:
    """One differential case; returns a failure dict or None."""
    from unmicst_tpu.io import _native, tiff

    codec = rng.randint(0, 6)
    kind = rng.randint(0, 4)
    plain = gen_payload(rng, kind)
    declared = len(plain)

    if codec == 0:  # inflate vs zlib
        stream = zlib.compress(plain, int(rng.randint(0, 10)))
        corrupt = rng.randint(0, 2) == 1
        if corrupt:
            stream = mutate(rng, stream)
            declared = max(declared, 4 * len(stream) + 4096)
        st, out = _native_call(
            lambda lib: lib.unmicst_inflate, stream, declared)
        try:
            ref = zlib.decompress(stream)
            ref_st = "ok" if len(ref) <= declared else "big"
        except zlib.error:
            ref, ref_st = b"", "reject"
        if st == "ok" and ref_st == "ok" and out != ref:
            return {"why": "inflate bytes mismatch"}
        if st == "ok" and ref_st == "reject":
            return {"why": "native inflate accepted a zlib-rejected stream"}
        # native-rejects-zlib-accepts is allowed only when the stream
        # overflows the declared buffer (zlib was unbounded here)
        if st == "reject" and ref_st == "ok" and not corrupt:
            return {"why": "native inflate rejected a valid stream"}
    elif codec == 1:  # LZW
        stream = lzw_encode(plain)
        corrupt = rng.randint(0, 2) == 1
        if corrupt:
            stream = mutate(rng, stream)
            declared = max(declared, 64 * len(stream) + 4096)
        st, out = _native_call(
            lambda lib: lib.unmicst_lzw_decode, stream, declared)
        try:
            ref = tiff._unpack_lzw(stream)
            ref_st = "ok" if len(ref) <= declared else "big"
        except (ValueError, IndexError):
            ref, ref_st = b"", "reject"
        if st == "ok" and ref_st == "ok" and out != ref:
            return {"why": "lzw bytes mismatch"}
        if st == "reject" and ref_st == "ok" and not corrupt:
            return {"why": "native lzw rejected a valid stream"}
        # _ex differential: same bytes as the plain decoder, and a
        # pristine fully-fitting stream must never flag overrun
        if st == "ok":
            exo, over = _native.lzw_decode_ex(stream, declared)
            if exo.tobytes() != out:
                return {"why": "lzw_ex bytes differ from lzw"}
            if not corrupt and len(out) < declared and over:
                return {"why": "lzw_ex flagged overrun on a clean "
                        "under-capacity stream"}
        # capacity-cut of the pristine stream: overrun must flag
        if not corrupt and len(plain) >= 2:
            exo, over = _native.lzw_decode_ex(stream, len(plain) // 2)
            if exo.tobytes() != plain[: len(plain) // 2] or not over:
                return {"why": "lzw_ex missed a capacity overrun"}
    elif codec == 2:  # PackBits
        stream = packbits_encode(plain)
        corrupt = rng.randint(0, 2) == 1
        if corrupt:
            stream = mutate(rng, stream)
            declared = max(declared, 128 * len(stream) + 4096)
        st, out = _native_call(
            lambda lib: lib.unmicst_packbits_decode, stream, declared)
        ref = tiff._unpack_packbits(stream)
        ref_st = "ok" if len(ref) <= declared else "big"
        if st == "ok" and ref_st == "ok" and out != ref:
            return {"why": "packbits bytes mismatch"}
        if st == "reject" and ref_st == "ok" and not corrupt:
            return {"why": "native packbits rejected a valid stream"}
        if st == "ok":
            exo, over = _native.packbits_decode_ex(stream, declared)
            if exo.tobytes() != out:
                return {"why": "packbits_ex bytes differ from packbits"}
            if not corrupt and len(out) < declared and over:
                return {"why": "packbits_ex flagged overrun on a clean "
                        "under-capacity stream"}
        if not corrupt and len(plain) >= 2:
            exo, over = _native.packbits_decode_ex(
                stream, len(plain) // 2)
            if exo.tobytes() != plain[: len(plain) // 2] or not over:
                return {"why": "packbits_ex missed a capacity overrun"}
    elif codec == 3:  # deflate round-trip
        enc = _native.deflate(plain)
        ref = zlib.decompress(enc)
        if ref != plain:
            return {"why": "deflate round-trip mismatch (zlib decode)"}
        out = _native.inflate(enc, len(plain))
        if out is None or out.tobytes() != plain:
            return {"why": "deflate round-trip mismatch (native decode)"}
    elif codec == 4:  # deflate_chain round-trip, random level
        lvl = int(rng.randint(4, 10))
        enc = _native.deflate_chain(plain, lvl)
        if zlib.decompress(enc) != plain:
            return {"why": f"deflate_chain({lvl}) round-trip mismatch"}
    else:  # decode_strips batched == per-strip
        import numpy as np

        nstrips = int(rng.randint(1, 9))
        tag = [8, 5, 32773][rng.randint(0, 3)]
        enc_one = {8: lambda d: zlib.compress(d, 6),
                   5: lzw_encode, 32773: packbits_encode}[tag]
        plains = [gen_payload(rng, rng.randint(0, 4))
                  for _ in range(nstrips)]
        encs = [enc_one(p) for p in plains]
        corrupt_at = (rng.randint(0, nstrips)
                      if rng.randint(0, 2) == 1 else -1)
        if corrupt_at >= 0:
            encs[corrupt_at] = mutate(rng, encs[corrupt_at])
        span = b"".join(encs)
        offs = np.cumsum([0] + [len(e) for e in encs[:-1]]).astype(np.int64)
        lens = np.array([len(e) for e in encs], np.int64)
        dlens = np.array([len(p) for p in plains], np.int64)
        doffs = np.cumsum([0] + [len(p) for p in plains[:-1]]
                          ).astype(np.int64)
        out = np.full(int(dlens.sum()) + SLACK, CANARY, np.uint8)
        view = out[:int(dlens.sum())]
        try:
            ok = _native.decode_strips(span, offs, lens, doffs, dlens,
                                       tag, view)
            st = "ok" if ok else "absent"
        except ValueError as e:
            st, msg = "reject", str(e)
        if not (out[int(dlens.sum()):] == CANARY).all():
            raise RuntimeError("decode_strips OOB write past dst")
        if corrupt_at < 0:
            if st != "ok":
                return {"why": f"decode_strips rejected a valid span: "
                        f"{msg if st == 'reject' else st}"}
            got = view.tobytes()
            want = b"".join(plains)
            if got != want:
                return {"why": "decode_strips bytes mismatch vs plaintext"}
        else:
            # corrupt strip: either rejected naming a strip <= corrupt_at,
            # or (mutation kept it decodable) every strip matches oracle
            if st == "ok":
                for i, p in enumerate(plains):
                    if i == corrupt_at:
                        continue
                    seg = view[doffs[i]:doffs[i] + dlens[i]].tobytes()
                    if seg != p:
                        return {"why": f"decode_strips corrupted clean "
                                f"strip {i} (corrupt was {corrupt_at})"}
    return None


# ---------------------------------------------------------------- file mode
def build_valid_files(tmp, rng) -> list:
    """A zoo of valid container files via the repo's own writer + PIL."""
    import numpy as np

    from unmicst_tpu.io.tiff import TiffWriter

    paths = []
    img = (np.arange(97 * 131, dtype=np.uint16).reshape(97, 131)
           * 7 % 1024).astype(np.uint16)
    img8 = (img % 256).astype(np.uint8)
    for name, wkw, comp in [
        ("plain.tif", {}, None),
        ("deflate.tif", {}, "deflate"),
        ("zstd.tif", {}, "zstd"),
        ("tiled.tif", {"tile": (32, 32)}, None),
        ("pyramid.tif", None, None),
    ]:
        p = os.path.join(tmp, name)
        try:
            with TiffWriter(p, compression=comp) as w:
                if wkw is None:
                    w.write_pyramid(img, min_size=24)
                else:
                    w.write(img, **wkw)
        except NotImplementedError:
            continue  # zstd backend absent on this box
        paths.append(p)
    try:
        from PIL import Image

        for name, comp in [("pil_lzw.tif", "tiff_lzw"),
                           ("pil_pb.tif", "packbits")]:
            p = os.path.join(tmp, name)
            Image.fromarray(img8).save(p, compression=comp)
            paths.append(p)
    except ImportError:
        pass
    assert paths, "no valid files produced"
    return paths


def patch_random_tag(rng, data: bytearray) -> None:
    """Structure-aware mutation: walk the first classic-TIFF IFD and
    overwrite one entry's type/count/value with extreme values —
    reaches states random byte flips rarely hit (count=0, huge counts,
    wrong field types, extreme dims)."""
    try:
        if data[:2] != b"II":
            return
        (magic,) = struct.unpack_from("<H", data, 2)
        if magic == 42:       # classic
            (ifd,) = struct.unpack_from("<I", data, 4)
            (n,) = struct.unpack_from("<H", data, ifd)
            ent0, esz, cfmt, coff, voff = ifd + 2, 12, "<I", 4, 8
        elif magic == 43:     # BigTIFF
            (ifd,) = struct.unpack_from("<Q", data, 8)
            (n,) = struct.unpack_from("<Q", data, ifd)
            ent0, esz, cfmt, coff, voff = ifd + 8, 20, "<Q", 4, 12
        else:
            return
        if not 0 < n < 64:
            return
        e = ent0 + esz * int(rng.randint(0, n))
        which = rng.randint(0, 3)
        v = [0, 1, 0xFFFF, 0xFFFFFFFF, 0x7FFFFFFF, 1 << 20, 1 << 30,
             len(data)][rng.randint(0, 8)]
        if which == 0:
            struct.pack_into("<H", data, e + 2, v & 0xFFFF)   # field type
        elif which == 1:
            struct.pack_into(cfmt, data, e + coff,
                             v & (2 ** (8 * struct.calcsize(cfmt)) - 1))
        else:
            struct.pack_into(cfmt, data, e + voff,
                             v & (2 ** (8 * struct.calcsize(cfmt)) - 1))
    except (struct.error, IndexError, OverflowError):
        pass  # already-mutated structure: skip


def file_case(rng, valid_files: list) -> dict | None:
    """Mutate one valid file and push it through the full read chain."""
    from unmicst_tpu.io.tiff import TiffFile

    src = valid_files[rng.randint(0, len(valid_files))]
    data = bytearray(open(src, "rb").read())
    nmut = int(rng.randint(1, 12))
    for _ in range(nmut):
        op = rng.randint(0, 9)
        if op < 5:  # byte flip anywhere (headers are tiny: bias there)
            zone = rng.randint(0, 2)
            hi = min(len(data), 512) if zone == 0 else len(data)
            data[rng.randint(0, hi)] ^= 1 << rng.randint(0, 8)
        elif op == 5 and len(data) > 16:  # truncate
            del data[rng.randint(8, len(data)):]
        elif op == 6:  # 4-byte field overwrite with extreme values
            i = rng.randint(0, max(1, len(data) - 4))
            v = [0, 0xFFFFFFFF, 0x7FFFFFFF, len(data), 1 << 30][
                rng.randint(0, 5)]
            data[i:i + 4] = struct.pack("<I", v & 0xFFFFFFFF)
        elif op == 7:  # splice random
            i = rng.randint(0, len(data))
            data[i:i] = bytes(rng.bytes(rng.randint(1, 32)))
        else:  # structure-aware tag patch
            patch_random_tag(rng, data)
    path = src + ".mut"
    with open(path, "wb") as f:
        f.write(bytes(data))
    try:
        with TiffFile(path) as tf:
            for pg in range(min(len(tf.pages), 4)):
                tf.read_page(pg)
                page = tf.pages[pg]
                tf.read_region(pg, 0, 0,
                               min(17, page.height), min(23, page.width))
                if page.subifds is not None and len(page.subifds):
                    tf.read_subifd(pg, 0)
        return None
    except Exception as e:  # noqa: BLE001 — the contract check IS the test
        names = [c.__name__ for c in type(e).__mro__]
        if any(n in FILE_CONTRACT for n in names):
            return None
        return {"why": f"contract leak: {type(e).__name__}: {e}",
                "src": os.path.basename(src)}
    finally:
        os.unlink(path)


# ------------------------------------------------------------- containers
def build_valid_containers(tmp, rng) -> list:
    """CZI/ND2 fixture zoo via the spec-derived writers the test suite
    uses (tests/test_slides_czi_nd2.py)."""
    import numpy as np

    from tests.test_slides_czi_nd2 import write_czi, write_nd2

    p0 = (np.arange(61 * 83, dtype=np.uint16).reshape(61, 83) * 13
          % 4096).astype(np.uint16)
    p1 = (p0[::-1] // 3).astype(np.uint16)
    paths = []
    specs = [
        ("plain.czi", lambda p: write_czi(p, [p0, p1])),
        ("mosaic.czi", lambda p: write_czi(p, [p0], tile_split=40)),
        # a metadata segment puts the channel_names XML parse chain
        # under mutation too
        ("named.czi", lambda p: write_czi(
            p, [p0, p1], channel_names=["DAPI", "Lamin"])),
    ]
    try:
        import zstandard  # noqa: F401

        specs += [
            ("zstd0.czi", lambda p: write_czi(p, [p0], compression=5)),
            ("zstd1.czi", lambda p: write_czi(p, [p0], compression=6,
                                              hilo=True)),
        ]
    except ImportError:
        pass
    specs.append(("frames.nd2", lambda p: write_nd2(
        p, [np.stack([p0, p1], axis=-1)])))

    def make_ome(p):
        # multi-page OME z-stack: hostile-description XML rides the
        # same read_channel chokepoint (ome.plane_index)
        from tests.test_ome import _ome_xml
        from unmicst_tpu.io.tiff import TiffWriter

        with TiffWriter(p) as w:
            w.write(p0, description=_ome_xml("XYZCT", 2, 3, 1))
            for _ in range(5):
                w.write(p1)

    specs.append(("stack.ome.tif", make_ome))
    for name, make in specs:
        path = os.path.join(tmp, name)
        make(path)
        paths.append(path)
    return paths


def container_case(rng, valid_files: list) -> dict | None:
    """Mutate a valid CZI/ND2 and push it through the server's container
    chokepoint (sniff_format + read_channel)."""
    from unmicst_tpu.io.slides import read_channel, sniff_format

    src = valid_files[rng.randint(0, len(valid_files))]
    data = bytearray(open(src, "rb").read())
    for _ in range(int(rng.randint(1, 10))):
        op = rng.randint(0, 8)
        if op < 5:
            zone = rng.randint(0, 2)
            hi = min(len(data), 1024) if zone == 0 else len(data)
            data[rng.randint(0, hi)] ^= 1 << rng.randint(0, 8)
        elif op == 5 and len(data) > 32:
            del data[rng.randint(16, len(data)):]
        elif op == 6:
            i = rng.randint(0, max(1, len(data) - 8))
            v = [0, 0xFFFFFFFFFFFFFFFF, 0x7FFFFFFFFFFFFFFF, len(data),
                 1 << 40][rng.randint(0, 5)]
            data[i:i + 8] = struct.pack("<Q", v & (2**64 - 1))
        else:
            i = rng.randint(0, len(data))
            data[i:i] = bytes(rng.bytes(rng.randint(1, 32)))
    path = src + ".mut"
    with open(path, "wb") as f:
        f.write(bytes(data))
    try:
        fmt = sniff_format(path)
        # the channel-name probe shares the parse chain and must obey
        # the same contract (serve resolves channel_name= before reading)
        from unmicst_tpu.io.slides import channel_names

        channel_names(path, fmt)
        read_channel(path, fmt, int(rng.randint(0, 3)))
        return None
    except Exception as e:  # noqa: BLE001 — the contract check IS the test
        names = [c.__name__ for c in type(e).__mro__]
        # IndexError: the documented out-of-range-channel contract
        # (cli.py catches it alongside ValueError)
        if any(n in FILE_CONTRACT + ("IndexError",) for n in names):
            return None
        return {"why": f"contract leak: {type(e).__name__}: {e}",
                "src": os.path.basename(src)}
    finally:
        os.unlink(path)


# ------------------------------------------------------------ query params
_QUERY_KEYS = (
    "model", "channel", "channel_name", "outlier", "scale", "roi",
    "range", "compress", "pyramid", "rescale", "probe", "slide",
    "bogus_key",
)
_QUERY_TOKENS = (
    "0", "1", "-1", "2", "0,1", "1,2,3", "nucleiDAPI", "../etc/passwd",
    "DAPI", "", "nan", "inf", "-inf", "1e308", "-5", "99.99", "101",
    "0.5", "16.01", "true", "maybe", "deflate", "zstd", "range",
    "0,0,64,64", "a,b,c,d", "-1,-1,10,10", "0,65535", "9,9", "5",
    "%00", "%ff%fe", "é中", "999999999999999999999999",
    "0," * 40, ",".join(["1"] * 100),
)


def start_query_server():
    """Live ModelServer on a random port (the real handler stack)."""
    import threading
    from http.server import ThreadingHTTPServer

    from unmicst_tpu.serve import ModelServer, make_handler

    srv = ModelServer(model_root="/root/reference/models",
                      precision="float32")
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, f"http://127.0.0.1:{httpd.server_address[1]}"


def build_query_body(tmp, rng) -> bytes:
    """One small OME-TIFF body (2 named channels) every query rides."""
    import numpy as np

    from unmicst_tpu.io.tiff import TiffWriter

    xml = (
        '<?xml version="1.0"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        '<Image ID="Image:0"><Pixels ID="Pixels:0" DimensionOrder="XYCZT" '
        'SizeC="2" SizeZ="1" SizeT="1" SizeX="48" SizeY="40" Type="uint16">'
        '<Channel ID="Channel:0:0" Name="DAPI"/>'
        '<Channel ID="Channel:0:1" Name="Lamin"/>'
        "</Pixels></Image></OME>"
    )
    path = os.path.join(tmp, "qbody.ome.tif")
    with TiffWriter(path, bigtiff=False) as tw:
        for i in range(2):
            tw.write((rng.rand(40, 48) * 60000).astype(np.uint16),
                     description=xml if i == 0 else None)
    return open(path, "rb").read()


def query_case(rng, ctx) -> dict | None:
    """Random query string through the live server: the contract is
    'a malformed request is a 4xx JSON error, never a 5xx' — the same
    property the hostile-body smoke pins for payloads."""
    import urllib.error
    import urllib.parse
    import urllib.request

    url_base, body = ctx
    n_params = int(rng.randint(1, 7))
    pairs = []
    for _ in range(n_params):
        k = _QUERY_KEYS[rng.randint(0, len(_QUERY_KEYS))]
        v = _QUERY_TOKENS[rng.randint(0, len(_QUERY_TOKENS))]
        pairs.append((k, v))
    query = urllib.parse.urlencode(pairs)
    req = urllib.request.Request(
        f"{url_base}/infer?{query}", data=body, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            status = r.status
            r.read()
    except urllib.error.HTTPError as e:
        status = e.code
        e.read()
    except Exception as e:  # noqa: BLE001 — transport failure IS a finding
        return {"why": f"transport error: {type(e).__name__}: {e}",
                "query": query}
    if status == 200 or 400 <= status < 500:
        return None
    return {"why": f"non-contract status {status}", "query": query}


# ------------------------------------------------------------- checkpoints
def build_valid_ckpts(tmp, rng) -> list:
    """A TF1 tensor bundle written by the in-repo writer (the format the
    model-zoo dirs ship; a half-copied dir is the realistic corruption)."""
    import numpy as np

    from unmicst_tpu.core.tf1_ckpt import write_tf1_checkpoint

    prefix = os.path.join(tmp, "model.ckpt")
    write_tf1_checkpoint(prefix, {
        "down/k1": rng.randn(3, 3, 1, 8).astype(np.float32),
        "down/b1": rng.randn(8).astype(np.float32),
        "top/kernel": rng.randn(1, 1, 8, 3).astype(np.float32),
        "bn/mean": rng.randn(8).astype(np.float64),
    })
    return [prefix]


def ckpt_case(rng, valid: list) -> dict | None:
    """Mutate the .index (and sometimes the data shard) of a valid TF1
    bundle and drive the reader: a corrupt checkpoint must raise
    ValueError/OSError/NotImplementedError/KeyError(name) — never
    IndexError/struct.error/UnicodeDecodeError internals."""
    import shutil

    from unmicst_tpu.core.tf1_ckpt import TF1Checkpoint

    prefix = valid[0]
    mut_prefix = prefix + ".mut"
    data_name = ".data-00000-of-00001"
    for suffix in (".index", data_name):
        shutil.copy(prefix + suffix, mut_prefix + suffix)
    target = [".index", data_name][rng.randint(0, 2)]
    data = bytearray(open(prefix + target, "rb").read())
    for _ in range(int(rng.randint(1, 8))):
        op = rng.randint(0, 8)
        if op < 5:
            data[rng.randint(0, len(data))] ^= 1 << rng.randint(0, 8)
        elif op == 5 and len(data) > 8:
            del data[rng.randint(4, len(data)):]
        elif op == 6:
            i = rng.randint(0, max(1, len(data) - 4))
            v = [0, 0xFFFFFFFF, len(data), 1 << 28][rng.randint(0, 4)]
            data[i:i + 4] = struct.pack("<I", v & 0xFFFFFFFF)
        else:
            i = rng.randint(0, len(data))
            data[i:i] = bytes(rng.bytes(rng.randint(1, 16)))
    with open(mut_prefix + target, "wb") as f:
        f.write(bytes(data))
    try:
        ck = TF1Checkpoint(mut_prefix)
        for name in ck.keys()[:8]:
            ck.get_shape(name)
            ck.get_tensor(name)
        return None
    except Exception as e:  # noqa: BLE001 — the contract check IS the test
        names = [c.__name__ for c in type(e).__mro__]
        if any(n in FILE_CONTRACT for n in names):
            return None
        return {"why": f"contract leak: {type(e).__name__}: {e}",
                "target": target}
    finally:
        for suffix in (".index", data_name):
            os.unlink(mut_prefix + suffix)


# ---------------------------------------------------------------- workers
def run_worker(mode: str, seed: int, n: int, mem_gib: float) -> int:
    import resource

    resource.setrlimit(resource.RLIMIT_AS,
                       (int(mem_gib * (1 << 30)),) * 2)
    import numpy as np

    rng = np.random.RandomState(seed)
    failures = []
    if mode == "query":
        import tempfile

        import jax

        jax.config.update("jax_platforms", "cpu")
        with tempfile.TemporaryDirectory() as tmp:
            body = build_query_body(tmp, rng)
            httpd, url = start_query_server()
            try:
                for i in range(n):
                    r = query_case(rng, (url, body))
                    if r:
                        r.update(seed=seed, case=i, mode=mode)
                        failures.append(r)
            finally:
                httpd.shutdown()
                httpd.server_close()
    elif mode in ("file", "container", "ckpt"):
        import tempfile

        build = {"file": build_valid_files,
                 "container": build_valid_containers,
                 "ckpt": build_valid_ckpts}[mode]
        case = {"file": file_case, "container": container_case,
                "ckpt": ckpt_case}[mode]
        with tempfile.TemporaryDirectory() as tmp:
            valid = build(tmp, rng)
            for i in range(n):
                r = case(rng, valid)
                if r:
                    r.update(seed=seed, case=i, mode=mode)
                    failures.append(r)
    else:
        for i in range(n):
            state = rng.get_state()
            r = codec_case(rng, i)
            if r:
                r.update(seed=seed, case=i, mode=mode,
                         state_hash=hash(state[1].tobytes()))
                failures.append(r)
    for f in failures:
        print("FAIL " + json.dumps(f), flush=True)
    print(f"worker seed={seed} n={n} failures={len(failures)}", flush=True)
    return 2 if failures else 0


def run_driver(args) -> int:
    os.makedirs(args.out, exist_ok=True)
    jobs = []
    per = max(1, args.n // args.jobs)
    for j in range(args.jobs):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--worker", args.mode, "--seed", str(args.seed + j),
               "--n", str(per), "--mem-gib", str(args.mem_gib)]
        jobs.append((j, subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)))
    bad = 0
    for j, p in jobs:
        try:
            out, _ = p.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out = p.communicate()[0] or ""
            print(f"[job {j}] HANG (> {args.timeout}s)")
            bad += 1
            continue
        tail = "\n".join(out.strip().splitlines()[-3:])
        if p.returncode == 0:
            print(f"[job {j}] ok: {tail}")
        else:
            bad += 1
            sig = -p.returncode if p.returncode < 0 else None
            label = f"signal {sig}" if sig else f"rc {p.returncode}"
            print(f"[job {j}] FAILED ({label}):\n{out}")
            rep = os.path.join(args.out,
                               f"fuzz_{args.mode}_s{args.seed + j}.json")
            with open(rep, "w") as f:
                json.dump({"mode": args.mode, "seed": args.seed + j,
                           "n": per, "rc": p.returncode,
                           "output": out[-8000:]}, f, indent=1)
            print(f"  repro spec -> {rep} (rerun: --worker {args.mode} "
                  f"--seed {args.seed + j} --n {per})")
    total = args.jobs * per
    print(json.dumps({"mode": args.mode, "cases": total,
                      "jobs": args.jobs, "failed_jobs": bad}))
    return 1 if bad else 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--mode", choices=["codec", "file", "container", "ckpt", "query"], default="codec")
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--jobs", type=int, default=2)
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--mem-gib", type=float, default=2.0)
    ap.add_argument("--out", default="/tmp/fuzz_native_failures")
    ap.add_argument("--worker", choices=["codec", "file", "container", "ckpt", "query"],
                    help="internal: run cases in-process")
    args = ap.parse_args()
    if args.worker:
        return run_worker(args.worker, args.seed, args.n, args.mem_gib)
    return run_driver(args)


if __name__ == "__main__":
    sys.exit(main())
