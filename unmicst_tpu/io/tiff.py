"""Self-contained TIFF reading/writing for whole-slide IO.

The reference delegates TIFF IO to ``tifffile``/``skimage`` (e.g.
``toolbox/imtools.py:10-14``, ``UnMicst1-5.py:794-797``) and writes uint8
BigTIFF probability maps with per-page append (``UnMicst1-5.py:834-843``:
``{'bigtiff': True, 'metadata': None, 'append': True}``).

This module implements that contract natively:

* ``TiffFile`` — a zero-copy-oriented reader for classic and BigTIFF files,
  II/MM byte orders, strip- or tile-organized pages, uncompressed / Deflate /
  LZW / PackBits codecs, 8/16/32-bit unsigned and float samples.  Supports
  whole-page reads and windowed region reads (only the strips/tiles that
  intersect the window are decoded) — the building block for streaming
  mega-slide inference without loading the slide into RAM.
* ``TiffWriter`` — classic/BigTIFF writer with multi-page append semantics
  matching the CLI output contract (append to an existing file re-chains the
  IFD linked list).
* ``imread`` / ``imwrite`` convenience wrappers (PIL fallback on exotic
  codecs, e.g. old-style JPEG).
"""

from __future__ import annotations

import os
import struct
import zlib
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

# TIFF tag ids used here.
TAG_IMAGE_WIDTH = 256
TAG_IMAGE_LENGTH = 257
TAG_BITS_PER_SAMPLE = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_IMAGE_DESCRIPTION = 270
TAG_STRIP_OFFSETS = 273
TAG_SAMPLES_PER_PIXEL = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_BYTE_COUNTS = 279
TAG_PLANAR_CONFIG = 284
TAG_PREDICTOR = 317
TAG_TILE_WIDTH = 322
TAG_TILE_LENGTH = 323
TAG_TILE_OFFSETS = 324
TAG_TILE_BYTE_COUNTS = 325
TAG_SAMPLE_FORMAT = 339

class PageTooLargeError(ValueError):
    """Full-page materialization refused; use windowed reads."""


COMPRESSION_NONE = 1
COMPRESSION_LZW = 5
COMPRESSION_DEFLATE_ADOBE = 8
COMPRESSION_DEFLATE = 32946
COMPRESSION_PACKBITS = 32773
COMPRESSION_LZMA = 34925   # libtiff: per-strip .xz streams
COMPRESSION_ZSTD = 50000   # libtiff/tifffile: per-strip zstd frames

# TIFF field types -> (struct char, size)
_FIELD_TYPES = {
    1: ("B", 1),  # BYTE
    2: ("s", 1),  # ASCII
    3: ("H", 2),  # SHORT
    4: ("I", 4),  # LONG
    5: ("I", 4),  # RATIONAL (two LONGs)
    6: ("b", 1),
    7: ("B", 1),
    8: ("h", 2),
    9: ("i", 4),
    10: ("i", 4),  # SRATIONAL (two SLONGs)
    11: ("f", 4),
    12: ("d", 8),
    13: ("I", 4),  # IFD (classic-TIFF SubIFD pointers, e.g. tifffile)
    16: ("Q", 8),  # LONG8 (BigTIFF)
    17: ("q", 8),
    18: ("Q", 8),  # IFD8
}


def _unpack_lzw(data: bytes, max_out: int = 0) -> bytes:
    """Decode TIFF-flavor LZW (MSB-first codes, early-change).

    ``max_out`` > 0 stops (and truncates) once that many bytes are out —
    libtiff semantics: the declared strip geometry, not the stream,
    bounds the output.  Real-world encoders with the early-change
    off-by-one at the final code before EOI need this (reading on would
    misparse the EOI at the bumped width; found by differential fuzz)."""
    result = bytearray()
    table: List[bytes] = []

    def reset_table():
        nonlocal table
        table = [bytes([i]) for i in range(256)] + [b"", b""]

    reset_table()
    bitpos = 0
    nbits = 9
    prev: Optional[bytes] = None
    maxlen = len(data) * 8
    while bitpos + nbits <= maxlen:
        byte0 = bitpos >> 3
        chunk = data[byte0 : byte0 + 4]
        val = int.from_bytes(chunk.ljust(4, b"\0"), "big")
        code = (val >> (32 - (bitpos & 7) - nbits)) & ((1 << nbits) - 1)
        bitpos += nbits
        if code == 256:  # clear
            reset_table()
            nbits = 9
            prev = None
            continue
        if code == 257:  # EOI
            break
        if prev is None:
            entry = table[code]
            result += entry
            prev = entry
        else:
            if code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream")
            result += entry
            prev = entry
        if max_out and len(result) >= max_out:
            return bytes(result[:max_out])
        # early-change: bump code width one code early (TIFF spec 6.0)
        if len(table) >= (1 << nbits) - 1 and nbits < 12:
            nbits += 1
    return bytes(result)


def _unpack_packbits(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:
            out += data[i : i + 1] * (257 - h)
            i += 1
    return bytes(out)


def _encode_deflate(data: bytes, level: int) -> bytes:
    """Strip encoder: levels 1..3 go through the native fast encoder
    (greedy match + per-block dynamic Huffman, 2-5x zlib-3 at <2% ratio
    cost on real probability maps — BASELINE.md); 4..9 use the native
    chain-search encoder at zlib's own good/lazy/nice/chain parameters
    for that level (zlib-class ratio, 2-4x faster — BASELINE.md).  A
    missing native lib falls back to zlib at the requested level."""
    from unmicst_tpu.io import _native

    if level <= 3:
        out = _native.deflate(data)
    else:
        out = _native.deflate_chain(data, level)
    if out is not None:
        return out
    return zlib.compress(data, level)


def _decode(data: bytes, compression: int, max_out: int = 0) -> bytes:
    """Decode one strip/tile.  Uses the native C++ codecs
    (``native/tiffcodec.cpp``, built via ``python native/build.py``) when
    available; pure-Python fallback otherwise."""
    if compression == COMPRESSION_NONE:
        return data
    if compression in (COMPRESSION_DEFLATE, COMPRESSION_DEFLATE_ADOBE):
        if max_out:
            # bound the output like the LZW/PackBits paths: a crafted
            # strip must not decompression-bomb the host (slack covers
            # writer-padded final strips; callers truncate)
            from unmicst_tpu.io import _native

            try:
                out = _native.inflate(data, max_out + 65536)
                if out is not None:
                    return out
            except ValueError:
                pass  # over-slack padding or native-rejected stream:
                # the zlib path below decodes and the caller truncates
            try:
                return zlib.decompressobj().decompress(
                    data, max_out + 65536
                )
            except zlib.error as exc:
                raise ValueError(f"corrupt deflate strip: {exc}") from None
        try:
            return zlib.decompress(data)
        except zlib.error as exc:
            raise ValueError(f"corrupt deflate strip: {exc}") from None
    if compression == COMPRESSION_LZW:
        if max_out:
            from unmicst_tpu.io import _native

            try:
                out = _native.lzw_decode(data, max_out)
                if out is not None:
                    return out
            except ValueError:
                pass  # native strict-contract miss: Python path below
        return _unpack_lzw(data, max_out)
    if compression == COMPRESSION_PACKBITS:
        if max_out:
            from unmicst_tpu.io import _native

            try:
                out = _native.packbits_decode(data, max_out)
                if out is not None:
                    return out
            except ValueError:
                pass
        return _unpack_packbits(data)
    if compression == COMPRESSION_ZSTD:
        # tifffile/libtiff zstd strips: one zstd frame each.  Output is
        # bounded by the strip geometry like every other codec here (the
        # slack covers writer-padded final strips; callers truncate).
        from unmicst_tpu.io import zstd as _zstd

        return _zstd.decompress(data, max_out + 65536 if max_out else
                                len(data) * 128 + 65536)
    if compression == COMPRESSION_LZMA:
        import lzma

        try:
            if max_out:
                return lzma.LZMADecompressor().decompress(
                    data, max_out + 65536
                )
            return lzma.decompress(data)
        except lzma.LZMAError as exc:
            raise ValueError(f"corrupt LZMA strip: {exc}") from None
    raise NotImplementedError(f"TIFF compression {compression} not supported")


def _undo_predictor(arr: np.ndarray, predictor: int) -> np.ndarray:
    """Undo horizontal differencing in place.

    ``arr``: (rows, width, samples) — the cumulative sum runs along the
    width axis per sample (TIFF spec 14; summing the samples axis instead
    silently corrupts predictor-2 files).
    """
    if predictor == 2:
        if (
            arr.shape[-1] == 1
            and arr.flags["C_CONTIGUOUS"]
            and arr.dtype.itemsize in (1, 2)
        ):
            from unmicst_tpu.io import _native

            if _native.predictor_undo(arr.reshape(arr.shape[0], -1)) is not None:
                return arr
        np.cumsum(arr, axis=1, dtype=arr.dtype, out=arr)
    return arr


@dataclass
class TiffPage:
    width: int
    height: int
    bits: int
    sample_format: int  # 1 uint, 2 int, 3 float
    samples: int
    compression: int
    predictor: int
    photometric: int
    planar: int
    rows_per_strip: int
    strip_offsets: np.ndarray
    strip_counts: np.ndarray
    tile_width: int = 0
    tile_length: int = 0
    tile_offsets: Optional[np.ndarray] = None
    tile_counts: Optional[np.ndarray] = None
    description: str = ""  # ImageDescription (OME-XML lives on page 0)
    subifds: Optional[np.ndarray] = None  # tag 330 (pyramid levels)

    @property
    def tiled(self) -> bool:
        return self.tile_offsets is not None

    @property
    def dtype(self) -> np.dtype:
        if self.bits % 8 != 0 or self.bits == 0:
            # 1/4/12-bit packed samples: bits//8 would silently
            # misinterpret the packed bytes — defer to the PIL fallback
            raise NotImplementedError(
                f"{self.bits}-bit packed TIFF samples not supported"
            )
        # hostile-header guard: sample formats beyond uint/int/float and
        # exotic widths would raise KeyError / numpy TypeError here
        if self.sample_format not in (1, 2, 3):
            raise NotImplementedError(
                f"TIFF sample format {self.sample_format} not supported"
            )
        if self.bits // 8 not in (1, 2, 4, 8):
            raise NotImplementedError(
                f"{self.bits}-bit TIFF samples not supported"
            )
        kind = {1: "u", 2: "i", 3: "f"}[self.sample_format]
        if kind == "f" and self.bits // 8 == 1:
            raise NotImplementedError("8-bit float TIFF samples")
        return np.dtype(f"{kind}{self.bits // 8}")


class TiffFile:
    """Minimal random-access TIFF reader (classic + BigTIFF)."""

    def __init__(self, path: str):
        self.path = path
        self._fh = open(path, "rb")
        try:
            self._init_parse(path)
        except Exception:
            # a parse failure must not leak the fd (hostile-input sweeps
            # and fuzz campaigns open thousands of corrupt files)
            self._fh.close()
            raise

    def _init_parse(self, path: str) -> None:
        self._fsize = os.fstat(self._fh.fileno()).st_size
        header = self._fh.read(16)
        if header[:2] == b"II":
            self.byteorder = "<"
        elif header[:2] == b"MM":
            self.byteorder = ">"
        else:
            raise ValueError(f"{path}: not a TIFF file")
        if len(header) < 8:
            raise ValueError(f"{path}: truncated TIFF header")
        magic = struct.unpack(self.byteorder + "H", header[2:4])[0]
        if magic == 42:
            self.big = False
            first_ifd = struct.unpack(self.byteorder + "I", header[4:8])[0]
        elif magic == 43:
            if len(header) < 16:
                raise ValueError(f"{path}: truncated BigTIFF header")
            self.big = True
            first_ifd = struct.unpack(self.byteorder + "Q", header[8:16])[0]
        else:
            raise ValueError(f"{path}: bad TIFF magic {magic}")
        self.pages: List[TiffPage] = []
        self._page_offsets: List[int] = []
        offset = first_ifd
        seen = set()
        while offset:
            if offset in seen:
                # corrupt next-IFD pointer looping back: fail, never hang
                raise ValueError(
                    f"{path}: IFD chain cycles back to offset {offset:#x}"
                )
            seen.add(offset)
            self._page_offsets.append(offset)
            page, offset = self._read_ifd(offset)
            self.pages.append(page)

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    # -- IFD parsing ---------------------------------------------------------

    def _read_ifd(self, offset: int) -> Tuple[TiffPage, int]:
        # hostile-input hardening (the server feeds uploaded bytes into
        # this parser): every length below is validated before use so a
        # truncated or crafted IFD raises ValueError — never a
        # struct.error leak, an unbounded fh.read allocation, or an
        # attribute crash downstream (fuzz: scripts/fuzz_native_codec.py)
        bo = self.byteorder
        fh = self._fh
        fh.seek(offset)
        head = fh.read(8 if self.big else 2)
        if len(head) < (8 if self.big else 2):
            raise ValueError(f"{self.path}: truncated IFD at {offset:#x}")
        if self.big:
            (n_entries,) = struct.unpack(bo + "Q", head)
            entry_size, count_fmt, off_fmt = 20, "Q", "Q"
        else:
            (n_entries,) = struct.unpack(bo + "H", head)
            entry_size, count_fmt, off_fmt = 12, "I", "I"
        if entry_size * n_entries > self._fsize:
            raise ValueError(
                f"{self.path}: IFD claims {n_entries} entries — more than "
                "the file can hold"
            )
        raw = fh.read(entry_size * n_entries)
        tail = fh.read(8 if self.big else 4)
        if len(raw) < entry_size * n_entries or len(tail) < (
            8 if self.big else 4
        ):
            raise ValueError(f"{self.path}: truncated IFD at {offset:#x}")
        (next_ifd,) = struct.unpack(bo + off_fmt, tail)

        tags = {}
        inline_size = 8 if self.big else 4
        for i in range(n_entries):
            ent = raw[i * entry_size : (i + 1) * entry_size]
            tag, ftype = struct.unpack(bo + "HH", ent[:4])
            (count,) = struct.unpack(bo + count_fmt, ent[4 : 4 + (8 if self.big else 4)])
            payload = ent[4 + (8 if self.big else 4) :]
            if ftype not in _FIELD_TYPES:
                continue
            ch, sz = _FIELD_TYPES[ftype]
            total = sz * count * (2 if ftype in (5, 10) else 1)
            if total <= inline_size:
                data = payload[:total]
            else:
                if total > self._fsize:
                    continue  # out-of-line data can't exceed the file:
                    # crafted count — treat the tag as absent/unusable
                (ptr,) = struct.unpack(bo + off_fmt, payload[: 8 if self.big else 4])
                pos = fh.tell()
                fh.seek(ptr)
                data = fh.read(total)
                fh.seek(pos)
                if len(data) < total:
                    continue  # points past EOF: same treatment
            if ftype == 2:
                # TIFF ASCII is nominally 7-bit but OME-XML is UTF-8 by spec
                tags[tag] = data.rstrip(b"\0").decode("utf-8", "replace")
            elif ftype in (5, 10):
                vals = struct.unpack(bo + ch[0] * 2 * count, data)
                tags[tag] = [
                    vals[2 * j] / vals[2 * j + 1] if vals[2 * j + 1] else 0
                    for j in range(count)
                ]
            else:
                tags[tag] = np.frombuffer(
                    data, dtype=np.dtype(ch).newbyteorder(bo), count=count
                )
        def scalar(tag, default=None):
            v = tags.get(tag)
            if v is None:
                return default
            if hasattr(v, "__len__"):
                # a crafted count=0 tag decodes to an empty array —
                # treat it as absent rather than IndexError on v[0]
                return int(v[0]) if len(v) else default
            return int(v)

        width = scalar(TAG_IMAGE_WIDTH)
        height = scalar(TAG_IMAGE_LENGTH)
        if width is None or height is None:
            raise ValueError("TIFF page missing dimensions")
        # untrusted-header plausibility guard: 2^20 px per side admits any
        # real whole-slide image (windowed reads never allocate the full
        # plane) while a corrupt dimension word fails here instead of in
        # np.empty.  Full-page materialization has its own allocation
        # guard in read_page.
        if not (0 < width <= 1 << 20 and 0 < height <= 1 << 20):
            raise ValueError(
                f"implausible TIFF page dimensions {width}x{height}"
            )
        bits_tag = tags.get(TAG_BITS_PER_SAMPLE)
        bits = (int(bits_tag[0])
                if bits_tag is not None and len(bits_tag) else 1)
        page = TiffPage(
            width=width,
            height=height,
            bits=bits,
            sample_format=scalar(TAG_SAMPLE_FORMAT, 1),
            samples=scalar(TAG_SAMPLES_PER_PIXEL, 1),
            compression=scalar(TAG_COMPRESSION, 1),
            predictor=scalar(TAG_PREDICTOR, 1),
            photometric=scalar(TAG_PHOTOMETRIC, 1),
            planar=scalar(TAG_PLANAR_CONFIG, 1),
            rows_per_strip=scalar(TAG_ROWS_PER_STRIP, height),
            strip_offsets=np.atleast_1d(tags.get(TAG_STRIP_OFFSETS, np.array([], np.int64))).astype(np.int64),
            strip_counts=np.atleast_1d(tags.get(TAG_STRIP_BYTE_COUNTS, np.array([], np.int64))).astype(np.int64),
            description=(
                tags[TAG_IMAGE_DESCRIPTION]
                if isinstance(tags.get(TAG_IMAGE_DESCRIPTION), str) else ""
            ),
        )
        if len(page.strip_offsets) != len(page.strip_counts):
            raise ValueError(
                f"TIFF StripOffsets/StripByteCounts length mismatch "
                f"({len(page.strip_offsets)} vs {len(page.strip_counts)})"
            )
        if TAG_TILE_OFFSETS in tags:
            page.tile_width = scalar(TAG_TILE_WIDTH)
            page.tile_length = scalar(TAG_TILE_LENGTH)
            # a tiled page with absent/zero/implausible tile geometry
            # would crash (None arithmetic) or allocate unboundedly in
            # the region reader — reject it here
            for v in (page.tile_width, page.tile_length):
                if v is None or not 0 < v <= 1 << 20:
                    raise ValueError(
                        f"implausible TIFF tile geometry "
                        f"{page.tile_width}x{page.tile_length}"
                    )
            if TAG_TILE_BYTE_COUNTS not in tags:
                raise ValueError("tiled TIFF page missing TileByteCounts")
            page.tile_offsets = np.atleast_1d(tags[TAG_TILE_OFFSETS]).astype(np.int64)
            page.tile_counts = np.atleast_1d(tags[TAG_TILE_BYTE_COUNTS]).astype(np.int64)
            if len(page.tile_offsets) != len(page.tile_counts):
                raise ValueError(
                    "TIFF TileOffsets/TileByteCounts length mismatch"
                )
        if 330 in tags:  # SubIFDs: reduced-resolution pyramid levels
            page.subifds = np.atleast_1d(tags[330]).astype(np.int64)
        return page, next_ifd

    def subifd_page(self, index: int, level: int) -> "TiffPage":
        """Parse (header only, no pixel decode) one SubIFD pyramid level
        of page ``index`` — cheap dimension/dtype inspection so pyramid-
        aware readers can pick a level before committing to a decode."""
        page = self.pages[index]
        if page.subifds is None:
            raise ValueError(f"page {index} has no SubIFDs")
        if not 0 <= level < len(page.subifds):
            raise ValueError(
                f"page {index} has {len(page.subifds)} pyramid level(s), "
                f"requested {level}"
            )
        try:
            sub, _ = self._read_ifd(int(page.subifds[level]))
        except (struct.error, ValueError):
            # truncated/corrupt SubIFD offset: name the SubIFD rather
            # than surfacing the generic IFD-parse error
            raise ValueError(
                f"corrupt SubIFD at offset {int(page.subifds[level]):#x}"
            ) from None
        return sub

    def read_subifd(self, index: int, level: int) -> np.ndarray:
        """Decode one SubIFD pyramid level of page ``index`` whole.

        The main page chain is unaffected by SubIFDs (``read_page(0)``
        stays the full-resolution plane); this is the explicit accessor
        for the reduced levels our pyramid writer (and QuPath-class
        tools) store under tag 330."""
        return self._read_page_obj(self.subifd_page(index, level))

    # -- decoding ------------------------------------------------------------

    def _decode_segment(
        self, offset: int, count: int, page: TiffPage, max_out: int = 0
    ) -> bytes:
        if offset < 0 or count < 0 or offset + count > self._fsize:
            # fh.read(count) allocates up front — a crafted byte count
            # must fail here, not as a MemoryError
            raise ValueError(
                f"TIFF segment at {offset} claims {count} bytes — "
                "extends past EOF"
            )
        self._fh.seek(offset)
        return _decode(self._fh.read(count), page.compression, max_out)

    def _batch_decode_ok(self, page) -> bool:
        """Shared precondition for the one-call native batched decoders:
        a codec unmicst_decode_strips speaks, the native lib present,
        and (for predictor-2 pages) a band layout the native predictor
        undo can take — 1- and 2-byte single-sample rows."""
        from unmicst_tpu.io import _native

        return (
            page.compression in (COMPRESSION_DEFLATE,
                                 COMPRESSION_DEFLATE_ADOBE,
                                 COMPRESSION_LZW, COMPRESSION_PACKBITS)
            and _native.get_lib() is not None
            and not (page.predictor == 2
                     and not (page.samples == 1
                              and page.dtype.itemsize in (1, 2)))
        )

    def _batched_span_decode(self, page, offs, cnts, dst_offs, dst_lens):
        """Span-gather + one-call native decode shared by the batched
        strip/tile readers: validates the segment layout (ascending,
        nonnegative), declines sparse spans (reading them would pull in
        unrelated bytes — the per-segment loops win there), reads the
        span once and decodes every segment straight into one uint8
        buffer.  Returns the buffer, or None when the layout declines or
        any segment misses the strict native contract — the per-segment
        chains are strictly more tolerant (native retry -> bounded
        Python decode -> truncate; writer slack and lenient-encoder
        lineages live in that gap), and genuinely corrupt segments still
        raise from them with segment context."""
        from unmicst_tpu.io import _native

        n = len(offs)
        if n == 0:
            return None  # no segments: let the caller's coverage check
            # report the truncation
        if n > 1 and np.any(np.diff(offs) < 0):
            return None  # descending/non-sequential layout
        if np.any(cnts < 0) or np.any(offs < 0):
            return None
        span0 = int(offs[0])
        span1 = int((offs + cnts).max())
        total = int(cnts.sum())
        need = span1 - span0
        if need < 0 or need > total + (total >> 2) + 65536:
            return None  # sparse span
        if span1 > self._fsize:
            return None  # claims bytes past EOF: the per-segment path
            # raises the precise truncation error (read() of a crafted
            # size would allocate before any short-read check)
        self._fh.seek(span0)
        span = self._fh.read(need)
        if len(span) < need:
            raise ValueError("TIFF data truncated mid-page")
        out8 = np.empty(int(dst_lens.sum()), np.uint8)
        codec = (8 if page.compression == COMPRESSION_DEFLATE else
                 int(page.compression))
        try:
            if not _native.decode_strips(
                span, offs - span0, cnts, dst_offs, dst_lens, codec, out8
            ):
                return None
        except ValueError:
            return None
        return out8

    def _read_strips_batched(self, page, dtype, row_bytes, s0, s1):
        """One-call native decode of strips [s0, s1) into a band buffer
        (rows ``s0*rps .. min(s1*rps, height)``, predictor undone, native
        byte order), or None when the page/layout/library doesn't support
        it (callers fall back to the per-strip loop).  Used whole-plane
        by read_page and windowed by read_region.  See
        unmicst_decode_strips in native/tiffcodec.cpp."""
        n = s1 - s0
        if n <= 0 or page.rows_per_strip <= 0 or not self._batch_decode_ok(page):
            return None
        offs = np.asarray(page.strip_offsets[s0:s1], np.int64)
        cnts = np.asarray(page.strip_counts[s0:s1], np.int64)
        rows_left = page.height - page.rows_per_strip * np.arange(
            s0, s1, dtype=np.int64
        )
        dst_lens = np.minimum(page.rows_per_strip, rows_left) * row_bytes
        if dst_lens.min() <= 0:
            return None  # more strips than rows: geometry mismatch
        dst_offs = np.concatenate(
            ([0], np.cumsum(dst_lens[:-1]))
        ).astype(np.int64)
        out8 = self._batched_span_decode(page, offs, cnts, dst_offs, dst_lens)
        if out8 is None:
            return None
        band_rows = int(dst_lens.sum()) // row_bytes
        arr = out8.view(dtype)
        if dtype != page.dtype:  # byte-swapped file: one swap copy
            arr = arr.astype(page.dtype)
        out = arr.reshape(band_rows, page.width * page.samples)
        if page.predictor == 2:
            _undo_predictor(
                out.reshape(band_rows, page.width, page.samples), 2
            )
        return out

    def _read_tiles_batched(self, page, dtype, ti0, ti1, tj0, tj1,
                            tiles_across):
        """One-call native decode of the tile rectangle
        ``[ti0, ti1) x [tj0, tj1)`` into a (n_tiles, th, tw, samples)
        array (predictor undone, native byte order), or None when the
        page/layout/library doesn't support it (callers fall back to the
        per-tile loop).  Tiles always decode to the full padded tile size
        (TIFF 6.0 "Tiled Images"), so every dst_len is tile_bytes; a
        writer that over-pads a compressed tile fails the exact-length
        native contract and falls back.  See unmicst_decode_strips in
        native/tiffcodec.cpp."""
        tw, th = page.tile_width, page.tile_length
        n = (ti1 - ti0) * (tj1 - tj0)
        if n <= 0 or tw <= 0 or th <= 0 or not self._batch_decode_ok(page):
            return None
        ks = (np.arange(ti0, ti1, dtype=np.int64)[:, None] * tiles_across
              + np.arange(tj0, tj1, dtype=np.int64)[None, :]).ravel()
        if int(ks[-1]) >= len(page.tile_offsets):
            return None  # header promises fewer tiles: per-tile loop raises
        offs = page.tile_offsets[ks].astype(np.int64)
        cnts = page.tile_counts[ks].astype(np.int64)
        tile_bytes = th * tw * page.samples * (page.bits // 8)
        dst_offs = np.arange(n, dtype=np.int64) * tile_bytes
        dst_lens = np.full(n, tile_bytes, np.int64)
        out8 = self._batched_span_decode(page, offs, cnts, dst_offs, dst_lens)
        if out8 is None:
            return None
        arr = out8.view(dtype)
        if dtype != page.dtype:  # byte-swapped file: one swap copy
            arr = arr.astype(page.dtype)
        tiles = arr.reshape(n, th, tw, page.samples)
        if page.predictor == 2:
            # tile rows are independent predictor rows of width tw
            _undo_predictor(tiles.reshape(n * th, tw, page.samples), 2)
        return tiles

    def read_page(self, index: int = 0) -> np.ndarray:
        """Decode a full page to a numpy array (H, W) or (H, W, S)."""
        return self._read_page_obj(self.pages[index])

    def _read_page_obj(self, page: TiffPage) -> np.ndarray:
        if page.planar != 1 and page.samples > 1:
            raise NotImplementedError("planar TIFF not supported")
        if page.predictor not in (1, 2):
            # predictor 3 (float differencing) etc.: decoding without the
            # undo would return difference bytes as pixels silently
            raise NotImplementedError(
                f"TIFF predictor {page.predictor} not supported"
            )
        dtype = page.dtype.newbyteorder(self.byteorder)
        # allocation guard for FULL-page materialization only — windowed
        # readers (read_region / the streaming sources) handle any size
        if page.height * page.width * page.samples > 1 << 31:
            raise PageTooLargeError(
                f"TIFF page {page.height}x{page.width} is too large to "
                "materialize whole; use windowed reads (read_region, or "
                "the streaming engine)"
            )
        if page.tiled:
            return self._read_region_obj(page, 0, 0, page.height, page.width)
        # Uncompressed pages whose strips sit back-to-back (the common
        # layout every sequential writer produces) read as ONE contiguous
        # region: one read + one dtype copy instead of a per-strip
        # decode/copy loop — ~2x on plain microscopy slides, which are
        # mostly stored uncompressed.
        row_bytes = page.width * page.samples * (page.bits // 8)
        n_strips = len(page.strip_offsets)
        full_strip = page.rows_per_strip * row_bytes
        if (
            page.compression == COMPRESSION_NONE
            and n_strips > 0
            and all(
                int(page.strip_counts[i]) == full_strip
                and int(page.strip_offsets[i]) + int(page.strip_counts[i])
                == int(page.strip_offsets[i + 1])
                for i in range(n_strips - 1)
            )
        ):
            need = page.height * row_bytes
            covered = (n_strips - 1) * full_strip + int(page.strip_counts[-1])
            if covered < need:
                raise ValueError(
                    f"TIFF strips cover {covered}/{need} bytes"
                )
            if int(page.strip_offsets[0]) + need > self._fsize:
                # fail before fh.read(need) allocates a crafted size
                raise ValueError("TIFF data truncated mid-page")
            self._fh.seek(int(page.strip_offsets[0]))
            buf = self._fh.read(need)
            if len(buf) < need:
                raise ValueError("TIFF data truncated mid-page")
            arr = np.frombuffer(
                buf, dtype=dtype, count=page.height * page.width * page.samples
            )
            out = arr.reshape(
                page.height, page.width * page.samples
            ).astype(page.dtype)
            if page.predictor == 2:
                _undo_predictor(
                    out.reshape(page.height, page.width, page.samples), 2
                )
            if page.samples > 1:
                out = out.reshape(page.height, page.width, page.samples)
            return out
        # Compressed pages with the native lib: decode EVERY strip in one
        # C call straight into the plane buffer (no per-strip ctypes
        # crossing, landing buffer, or assembly copy — measured +15-20%
        # on deflate/LZW planes, scripts/codec_bench.py).  Falls through
        # to the per-strip loop for descending strip layouts, sparse
        # spans, or predictor/sample combos the native undo can't take.
        batched = self._read_strips_batched(page, dtype, row_bytes, 0, n_strips)
        if batched is not None:
            if page.samples > 1:
                return batched.reshape(page.height, page.width, page.samples)
            return batched
        rows_done = 0
        out = np.empty((page.height, page.width * page.samples), page.dtype)
        for off, cnt in zip(page.strip_offsets, page.strip_counts):
            nrows = min(page.rows_per_strip, page.height - rows_done)
            seg_bytes = nrows * page.width * page.samples * (page.bits // 8)
            buf = self._decode_segment(int(off), int(cnt), page, seg_bytes)
            arr = np.frombuffer(buf, dtype=dtype, count=nrows * page.width * page.samples)
            arr = arr.reshape(nrows, page.width * page.samples).astype(page.dtype)
            if page.predictor == 2:
                _undo_predictor(arr.reshape(nrows, page.width, page.samples), 2)
            out[rows_done : rows_done + nrows] = arr
            rows_done += nrows
        if rows_done < page.height:
            # fewer strips than the header promises: np.empty rows would
            # otherwise leak uninitialized heap memory as image data
            raise ValueError(
                f"TIFF strips cover {rows_done}/{page.height} rows"
            )
        if page.samples > 1:
            out = out.reshape(page.height, page.width, page.samples)
        return out

    def read_region(
        self, index: int, r0: int, c0: int, nrows: int, ncols: int
    ) -> np.ndarray:
        """Decode only the strips/tiles intersecting a window.

        This is the streaming primitive: for a 100k x 100k tiled OME-TIFF we
        touch only the bytes under the requested stripe.
        """
        return self._read_region_obj(self.pages[index], r0, c0, nrows, ncols)

    def _read_region_obj(
        self, page: TiffPage, r0: int, c0: int, nrows: int, ncols: int
    ) -> np.ndarray:
        if page.planar != 1 and page.samples > 1:
            raise NotImplementedError("planar TIFF not supported")
        if page.predictor not in (1, 2):
            raise NotImplementedError(
                f"TIFF predictor {page.predictor} not supported"
            )
        dtype = page.dtype.newbyteorder(self.byteorder)
        out = np.zeros((nrows, ncols, page.samples), page.dtype)
        r1, c1 = r0 + nrows, c0 + ncols
        if page.tiled:
            tw, th = page.tile_width, page.tile_length
            tiles_across = (page.width + tw - 1) // tw
            tiles_down = (page.height + th - 1) // th
            if len(page.tile_offsets) < tiles_across * tiles_down:
                # crafted tile geometry claiming more tiles than the
                # offsets array holds would index past it below
                raise ValueError(
                    f"TIFF page needs {tiles_across * tiles_down} tiles "
                    f"but holds {len(page.tile_offsets)} offsets"
                )
            ti0, ti1 = r0 // th, (min(r1, page.height) + th - 1) // th
            tj0, tj1 = c0 // tw, (min(c1, page.width) + tw - 1) // tw
            band = self._read_tiles_batched(
                page, dtype, ti0, ti1, tj0, tj1, tiles_across
            )
            idx = 0
            for ti in range(ti0, ti1):
                for tj in range(tj0, tj1):
                    if band is not None:
                        arr = band[idx]
                        idx += 1
                    else:
                        k = ti * tiles_across + tj
                        buf = self._decode_segment(
                            int(page.tile_offsets[k]),
                            int(page.tile_counts[k]),
                            page, th * tw * page.samples * (page.bits // 8),
                        )
                        arr = np.frombuffer(
                            buf, dtype=dtype, count=th * tw * page.samples
                        )
                        arr = arr.reshape(th, tw, page.samples).astype(page.dtype)
                        if page.predictor == 2:
                            _undo_predictor(arr, 2)
                    tr0, tc0 = ti * th, tj * tw
                    sr0, sr1 = max(r0, tr0), min(r1, tr0 + th, page.height)
                    sc0, sc1 = max(c0, tc0), min(c1, tc0 + tw, page.width)
                    out[sr0 - r0 : sr1 - r0, sc0 - c0 : sc1 - c0] = arr[
                        sr0 - tr0 : sr1 - tr0, sc0 - tc0 : sc1 - tc0
                    ]
        else:
            rps = page.rows_per_strip
            s0, s1 = r0 // rps, (min(r1, page.height) + rps - 1) // rps
            if s1 > len(page.strip_offsets):
                # crafted RowsPerStrip implying more strips than the
                # offsets array holds would index past it below
                raise ValueError(
                    f"TIFF page needs {s1} strips but holds "
                    f"{len(page.strip_offsets)} offsets"
                )
            row_bytes = page.width * page.samples * (page.bits // 8)
            band = (
                self._read_strips_batched(page, dtype, row_bytes, s0, s1)
                if s1 > s0 else None
            )
            if band is not None:
                # one native call decoded strips [s0, s1) as whole rows;
                # slice the window out of the band
                band = band.reshape(-1, page.width, page.samples)
                b0 = s0 * rps
                a, b = max(r0, b0), min(r1, b0 + band.shape[0])
                cc1 = min(c1, page.width)
                out[a - r0 : b - r0, : cc1 - c0] = band[a - b0 : b - b0, c0:cc1]
            else:
                for s in range(s0, s1):
                    sr0 = s * rps
                    srows = min(rps, page.height - sr0)
                    buf = self._decode_segment(
                        int(page.strip_offsets[s]), int(page.strip_counts[s]),
                        page,
                        srows * page.width * page.samples * (page.bits // 8),
                    )
                    arr = np.frombuffer(
                        buf, dtype=dtype,
                        count=srows * page.width * page.samples,
                    )
                    arr = arr.reshape(
                        srows, page.width, page.samples
                    ).astype(page.dtype)
                    if page.predictor == 2:
                        _undo_predictor(arr, 2)
                    a, b = max(r0, sr0), min(r1, sr0 + srows)
                    cc1 = min(c1, page.width)
                    out[a - r0 : b - r0, : cc1 - c0] = arr[
                        a - sr0 : b - sr0, c0:cc1
                    ]
        if page.samples == 1:
            out = out[:, :, 0]
        return out


def _box_downsample2(img: np.ndarray) -> np.ndarray:
    """2x2 box-mean pyramid reduction (the standard whole-slide level
    generator); odd edges average the available pixels (edge-replicate
    pad), integer dtypes round half up (``(sum + 2) >> 2``, equal to
    +0.5 truncation of the float mean for nonnegative data).

    Processes row BANDS so the temporaries stay bounded — a pyramid of a
    multi-Gpx uint8 probability map must not materialize a float64 copy
    of the whole plane (the streaming writers call this per page)."""
    h, w = img.shape
    ph, pw = h + (h & 1), w + (w & 1)
    out = np.empty((ph // 2, pw // 2), img.dtype)
    integer = np.issubdtype(img.dtype, np.integer)
    band = 4096  # even; ~band*w temporaries at 4-8 bytes/px
    for r0 in range(0, ph, band):
        r1 = min(r0 + band, ph)
        blk = img[r0 : min(r1, h)]
        pad_r = (r1 - r0) - blk.shape[0]
        if pad_r or pw != w:
            blk = np.pad(blk, ((0, pad_r), (0, pw - w)), mode="edge")
        q = blk.reshape((r1 - r0) // 2, 2, pw // 2, 2)
        if integer:
            sums = q.astype(np.int64).sum(axis=(1, 3))
            out[r0 // 2 : r1 // 2] = ((sums + 2) >> 2).astype(img.dtype)
        else:
            out[r0 // 2 : r1 // 2] = q.astype(np.float64).mean(
                axis=(1, 3)
            ).astype(img.dtype)
    return out


class TiffWriter:
    """Grayscale multi-page TIFF/BigTIFF writer with append semantics.

    Matches the reference output contract (``UnMicst1-5.py:834-843``):
    bigtiff, no extra metadata, per-page append.  Little-endian,
    strip-per-~1MB layout; uncompressed by default, opt-in per-strip
    Deflate (``compression="deflate"`` — probability maps shrink ~5-10x
    and every TIFF reader, this one included, decodes tag 8) or Zstd
    (``compression="zstd"``, tag 50000 — faster and smaller than
    deflate on probability maps, readable by tifffile/libtiff-based
    consumers; measured table in BASELINE.md).
    """

    _MAGIC_CLASSIC = 42
    _MAGIC_BIG = 43

    def __init__(self, path: str, bigtiff: bool = True, append: bool = False,
                 compression: Optional[str] = None,
                 compression_level: int = 3):
        if compression not in (None, "deflate", "zstd"):
            raise ValueError(f"unsupported output compression {compression!r}")
        if not 1 <= int(compression_level) <= 9:
            raise ValueError(
                f"compression_level must be 1..9, got {compression_level}"
            )
        if compression == "zstd":
            from unmicst_tpu.io import zstd as _zstd

            if not _zstd.compress_available():
                raise NotImplementedError(
                    "compression='zstd' needs the 'zstandard' package or "
                    "a system libzstd"
                )
        self._codec = compression
        self._compress = compression is not None
        # deflate levels 1..3 (3 = default) route through the native
        # greedy encoder, 4..9 the native chain-search encoder
        # (BASELINE.md "deflate encode"); zstd levels map 1:1
        self._level = int(compression_level)
        self.path = path
        self.big = bigtiff
        exists = os.path.exists(path) and os.path.getsize(path) > 0
        if append and exists:
            # Honor the existing file's format; find the tail of the IFD chain.
            self._fh = open(path, "r+b")
            self._parse_existing()
        else:
            self._fh = open(path, "w+b")
            if self.big:
                self._fh.write(struct.pack("<2sHHHQ", b"II", 43, 8, 0, 0))
            else:
                self._fh.write(struct.pack("<2sHI", b"II", 42, 0))
            # patch target for the first IFD pointer:
            self._last_ifd_ptr_pos = 8 if self.big else 4
            self._ptr_fmt = "<Q" if self.big else "<I"

    def _parse_existing(self):
        fh = self._fh
        fh.seek(0)
        header = fh.read(16)
        if header[:2] != b"II":
            raise NotImplementedError("append to big-endian TIFF not supported")
        magic = struct.unpack("<H", header[2:4])[0]
        self.big = magic == 43
        self._ptr_fmt = "<Q" if self.big else "<I"
        ptr_pos = 8 if self.big else 4
        fh.seek(ptr_pos)
        (offset,) = struct.unpack(self._ptr_fmt, fh.read(8 if self.big else 4))
        seen = set()
        while offset:
            if offset in seen:
                raise ValueError(
                    f"{self.path}: IFD chain cycles at {offset:#x}"
                )
            seen.add(offset)
            fh.seek(offset)
            if self.big:
                (n,) = struct.unpack("<Q", fh.read(8))
                ptr_pos = offset + 8 + 20 * n
            else:
                (n,) = struct.unpack("<H", fh.read(2))
                ptr_pos = offset + 2 + 12 * n
            fh.seek(ptr_pos)
            (offset,) = struct.unpack(self._ptr_fmt, fh.read(8 if self.big else 4))
        self._last_ifd_ptr_pos = ptr_pos
        fh.seek(0, os.SEEK_END)

    def write(self, image: np.ndarray, description: Optional[str] = None,
              tile: Optional[Tuple[int, int]] = None) -> None:
        """Append one grayscale page (uint8/uint16/float32).

        ``description`` writes an ImageDescription tag (e.g. OME-XML on the
        first page of an OME-TIFF).  ``tile=(th, tw)`` writes a
        tile-organized page (dims multiples of 16, TIFF 6.0 "Tiled
        Images") — what pyramid viewers and window-readers want for
        mega-slide outputs."""
        self._write_page(image, description, tile=tile)

    def write_pyramid(self, image: np.ndarray,
                      description: Optional[str] = None,
                      tile: Tuple[int, int] = (256, 256),
                      min_size: int = 256) -> int:
        """Append a pyramidal page: full resolution + SubIFD (tag 330)
        chain of 2x box-mean reduced levels, every level tiled.

        The layout QuPath/Avivator/tifffile-class viewers consume for
        whole-slide outputs; levels halve until the next level would
        drop under ``min_size`` on its short edge.  The main IFD chain
        stays flat-page compatible — readers that ignore SubIFDs (ours
        included, ``test_subifd_pyramid_levels_ignored``) see exactly
        the usual full-res page sequence.  Returns the number of
        reduced levels written."""
        image = np.ascontiguousarray(image)
        if image.ndim != 2:
            raise ValueError("TiffWriter writes single-sample 2D pages")
        levels = []
        cur = image
        while min(cur.shape[0], cur.shape[1]) >= 2 * min_size:
            cur = _box_downsample2(cur)
            levels.append(cur)
        sub_offsets = [
            self._write_page(lv, None, tile=tile, subfile_type=1,
                             chain=False)
            for lv in levels
        ]
        self._write_page(image, description, tile=tile,
                         subifd_offsets=sub_offsets or None)
        return len(levels)

    def _encode_segment(self, data: bytes) -> bytes:
        if self._codec == "deflate":
            return _encode_deflate(data, self._level)
        if self._codec == "zstd":
            from unmicst_tpu.io import zstd as _zstd

            return _zstd.compress(data, self._level)
        return data

    def _write_page(self, image: np.ndarray,
                    description: Optional[str] = None,
                    tile: Optional[Tuple[int, int]] = None,
                    subifd_offsets=None, subfile_type: Optional[int] = None,
                    chain: bool = True) -> int:
        """Write one page's data + IFD; link it into the page chain
        unless ``chain=False`` (SubIFD pyramid levels).  Returns the IFD
        offset."""
        image = np.ascontiguousarray(image)
        if image.ndim != 2:
            raise ValueError("TiffWriter writes single-sample 2D pages")
        if image.dtype.byteorder == ">":
            image = image.astype(image.dtype.newbyteorder("<"))
        h, w = image.shape
        itemsize = image.dtype.itemsize
        sample_format = 3 if image.dtype.kind == "f" else (2 if image.dtype.kind == "i" else 1)

        fh = self._fh
        fh.seek(0, os.SEEK_END)
        if fh.tell() % 2:
            fh.write(b"\0")
        seg_offsets, seg_counts = [], []
        if tile is not None:
            th, tw = int(tile[0]), int(tile[1])
            if th <= 0 or tw <= 0 or th % 16 or tw % 16:
                raise ValueError(
                    f"tile dims must be positive multiples of 16, got "
                    f"({th}, {tw})"
                )
            for r0 in range(0, h, th):
                for c0 in range(0, w, tw):
                    blk = image[r0 : r0 + th, c0 : c0 + tw]
                    if blk.shape != (th, tw):
                        # edge tiles store the full padded tile (spec)
                        full = np.zeros((th, tw), image.dtype)
                        full[: blk.shape[0], : blk.shape[1]] = blk
                        blk = full
                    data = self._encode_segment(blk.tobytes())
                    seg_offsets.append(fh.tell())
                    seg_counts.append(len(data))
                    fh.write(data)
            rows_per_strip = 0  # unused in tiled pages
        else:
            rows_per_strip = max(1, min(h, (1 << 20) // max(1, w * itemsize)))
            n_strips = (h + rows_per_strip - 1) // rows_per_strip
            for s in range(n_strips):
                data = self._encode_segment(
                    image[s * rows_per_strip : (s + 1) * rows_per_strip]
                    .tobytes()
                )
                seg_offsets.append(fh.tell())
                seg_counts.append(len(data))
                fh.write(data)
        strip_offsets, strip_counts = seg_offsets, seg_counts

        # Out-of-line arrays (strip offsets/counts) when they don't fit inline.
        def maybe_outline(values, fmt_char, inline_slots):
            nonlocal fh
            if len(values) <= inline_slots:
                return None, values
            if fh.tell() % 2:
                fh.write(b"\0")
            pos = fh.tell()
            fh.write(struct.pack(f"<{len(values)}{fmt_char}", *values))
            return pos, values

        if self.big:
            off_type, off_char, inline = 16, "Q", 1
        else:
            off_type, off_char, inline = 4, "I", 1
        so_ptr, _ = maybe_outline(strip_offsets, off_char, inline)
        sc_ptr, _ = maybe_outline(strip_counts, off_char, inline)
        sub_ptr = None
        if subifd_offsets is not None:
            sub_ptr, _ = maybe_outline(subifd_offsets, off_char, inline)
        # ImageDescription: UTF-8 (OME-XML spec) + single terminating NUL;
        # count is the exact byte length, inline when it fits the value slot.
        desc_ptr = None
        desc_bytes = b""
        if description is not None:
            desc_bytes = description.encode("utf-8") + b"\x00"
            if len(desc_bytes) > (8 if self.big else 4):
                if fh.tell() % 2:
                    fh.write(b"\0")
                desc_ptr = fh.tell()
                fh.write(desc_bytes)

        # entries: (tag, ftype, count, values, is_ptr) in ASCENDING tag
        # order (TIFF 6.0 requires it; some readers enforce it)
        entries = [
            (TAG_IMAGE_WIDTH, 4, 1, [w], False),
            (TAG_IMAGE_LENGTH, 4, 1, [h], False),
            (TAG_BITS_PER_SAMPLE, 3, 1, [itemsize * 8], False),
            (TAG_COMPRESSION, 3, 1,
             [COMPRESSION_ZSTD if self._codec == "zstd"
              else COMPRESSION_DEFLATE_ADOBE if self._compress
              else COMPRESSION_NONE], False),
            (TAG_PHOTOMETRIC, 3, 1, [1], False),
        ]
        if subfile_type is not None:
            # 254 NewSubfileType (bit 0 = reduced-resolution pyramid level)
            entries.insert(0, (254, 4, 1, [int(subfile_type)], False))
        if description is not None:
            entries.append((
                TAG_IMAGE_DESCRIPTION, 2, len(desc_bytes),
                [desc_ptr] if desc_ptr is not None else desc_bytes,
                desc_ptr is not None,
            ))
        if tile is None:
            entries += [
                (TAG_STRIP_OFFSETS, off_type, len(strip_offsets),
                 [so_ptr] if so_ptr is not None else strip_offsets,
                 so_ptr is not None),
                (TAG_SAMPLES_PER_PIXEL, 3, 1, [1], False),
                (TAG_ROWS_PER_STRIP, 4, 1, [rows_per_strip], False),
                (TAG_STRIP_BYTE_COUNTS, off_type, len(strip_counts),
                 [sc_ptr] if sc_ptr is not None else strip_counts,
                 sc_ptr is not None),
            ]
        else:
            entries += [
                (TAG_SAMPLES_PER_PIXEL, 3, 1, [1], False),
                (TAG_TILE_WIDTH, 4, 1, [tw], False),
                (TAG_TILE_LENGTH, 4, 1, [th], False),
                (TAG_TILE_OFFSETS, off_type, len(strip_offsets),
                 [so_ptr] if so_ptr is not None else strip_offsets,
                 so_ptr is not None),
                (TAG_TILE_BYTE_COUNTS, off_type, len(strip_counts),
                 [sc_ptr] if sc_ptr is not None else strip_counts,
                 sc_ptr is not None),
            ]
        if subifd_offsets is not None:
            entries.append((
                330, off_type, len(subifd_offsets),
                [sub_ptr] if sub_ptr is not None else subifd_offsets,
                sub_ptr is not None,
            ))
        entries.append((TAG_SAMPLE_FORMAT, 3, 1, [sample_format], False))

        if fh.tell() % 2:
            fh.write(b"\0")
        ifd_pos = fh.tell()
        # one serialization loop for both layouts (BigTIFF: 8-byte counts
        # + value slots; classic: 2-byte count, 4-byte slots)
        if self.big:
            slot, count_fmt, entry_fmt, ptr_fmt = 8, "<Q", "<HHQ", "<Q"
        else:
            slot, count_fmt, entry_fmt, ptr_fmt = 4, "<H", "<HHI", "<I"
        buf = struct.pack(count_fmt, len(entries))
        for tag, ftype, count, values, is_ptr in entries:
            ch, _ = _FIELD_TYPES[ftype]
            if isinstance(values, bytes):
                payload = values.ljust(slot, b"\0")
            elif is_ptr:
                payload = struct.pack(ptr_fmt, values[0])
            else:
                payload = struct.pack(
                    f"<{len(values)}{ch}", *values
                ).ljust(slot, b"\0")
            buf += struct.pack(entry_fmt, tag, ftype, count) + payload
        buf += struct.pack(ptr_fmt, 0)
        fh.write(buf)

        if chain:
            # Re-chain: point the previous IFD (or header) at this new IFD.
            fh.seek(self._last_ifd_ptr_pos)
            fh.write(struct.pack(self._ptr_fmt, ifd_pos))
            # Next-IFD pointer position inside the IFD we just wrote:
            if self.big:
                self._last_ifd_ptr_pos = ifd_pos + 8 + 20 * len(entries)
            else:
                self._last_ifd_ptr_pos = ifd_pos + 2 + 12 * len(entries)
        fh.flush()
        return ifd_pos

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def imread(path: str, page: int = 0) -> np.ndarray:
    """Read one TIFF page; native reader first, PIL fallback for exotic codecs."""
    try:
        with TiffFile(path) as tf:
            arr = tf.read_page(page)
        # normalize to native byte order
        if arr.dtype.byteorder not in ("=", "|"):
            arr = arr.astype(arr.dtype.newbyteorder("="))
        return arr
    except PageTooLargeError:
        # deliberate materialization refusal — PIL would attempt the very
        # allocation the guard prevents; keep the actionable message
        raise
    except (NotImplementedError, ValueError):
        from PIL import Image

        with Image.open(path) as im:  # close promptly: sweeps leak fds
            im.seek(page)
            return np.asarray(im)


def num_pages(path: str) -> int:
    with TiffFile(path) as tf:
        return len(tf.pages)


def imwrite(
    path: str, image: np.ndarray, bigtiff: bool = True, append: bool = False,
    compression: Optional[str] = None, compression_level: int = 3,
    pyramid: bool = False, tile: Optional[Tuple[int, int]] = None,
) -> None:
    """Write/append one grayscale page (reference contract ``UnMicst1-5.py:852-862``).

    ``pyramid=True`` writes the page tiled with a SubIFD pyramid
    (viewer-ready, see :meth:`TiffWriter.write_pyramid`); ``tile``
    alone writes a flat tiled page."""
    with TiffWriter(path, bigtiff=bigtiff, append=append,
                    compression=compression,
                    compression_level=compression_level) as tw:
        if pyramid:
            tw.write_pyramid(image, tile=tile or (256, 256))
        else:
            tw.write(image, tile=tile)
